# Native components (reference parity: C15 build system, SURVEY.md sec. 3).
# The Python wrappers (ops/cref.py, swimm_tpu/native.py) build these on
# demand too; this Makefile is for explicit/offline builds.

CC      ?= cc
CFLAGS  ?= -O2 -fPIC -shared -Wall

all: csrc/libswref.so csrc/libswpack.so

csrc/libswref.so: csrc/swref.c
	$(CC) $(CFLAGS) -o $@ $<

csrc/libswpack.so: csrc/swpack.c
	$(CC) $(CFLAGS) -o $@ $<

# sanitizer build of the native components (SURVEY.md 6.2: the reference
# avoided races structurally; our native code is single-threaded C, checked
# under ASan+UBSan here)
asan: CFLAGS = -O1 -g -fPIC -shared -Wall -fsanitize=address,undefined
asan: clean all

test:
	python -m pytest tests/ -q

test-tpu:
	python -m pytest tests_tpu/ -q

# curated <3-minute (warm-cache) hardware gate: every BASELINE config +
# ragged parity + streaming at small fixed shapes (tests_tpu/test_smoke.py)
test-tpu-smoke:
	python -m pytest tests_tpu/ -q -m smoke

bench:
	python bench.py

accept:
	python benchmarks/acceptance.py

clean:
	rm -f csrc/*.so

.PHONY: all test test-tpu test-tpu-smoke bench accept clean
