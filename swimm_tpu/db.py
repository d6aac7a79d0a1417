"""Packed binary database format (L1/L4: reference components C3 + C4).

Parity target (SURVEY.md section 3, C3/C4 and section 4.1): the reference's
``preprocess`` mode sorts sequences by length ascending, packs residues, and
emits a binary blob + length/offset/title indexes, grouped into vector-lane
blocks and chunks. TPU-first redesign:

- Sequences are length-sorted ascending and assigned to **blocks of V lanes**
  (V = lane count per DP step, default 128 = the TPU vector lane width, so a
  packed block maps 1:1 onto a kernel lane block). Length sorting makes co-bucketed
  lanes near-equal length, minimizing padding waste — the same reason the
  reference sorts (SURVEY.md section 1, item 2).
- Each block is padded to a quantized length L (multiples that grow with L,
  bounding the number of distinct compiled kernel shapes), and consecutive
  blocks with equal L form a **chunk**: one rectangular int8 array of shape
  ``(n_blocks, L, V)`` with PAD_CODE fill. Rectangular static shapes are what
  XLA/Pallas need (no ragged/dynamic shapes on the MXU/VPU path).
- A versioned JSON manifest + .npy files enable memmap loading and per-shard
  streaming (SURVEY.md section 6.4: the packed DB is a cached, versioned
  input; per-shard layout enables multi-host loading).

Layout notes: arrays are stored (n_blocks, L, V) so a DP step j reads the
contiguous (V,) residue vector ``codes[b, j, :]`` — lanes are the minor axis,
matching the kernel's lane-parallel layout.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from swimm_tpu.alphabet import PAD_CODE
from swimm_tpu.fasta import iter_fasta

FORMAT_VERSION = 1


def _input_digest(code_chunks, lengths, titles) -> str:
    """Content fingerprint of a parsed FASTA input (codes + lengths +
    titles), stored in the manifest so resume=True can prove the existing
    pack matches THIS input — the old (n_seqs, V, total_residues) check
    accepted any same-shape edit, silently serving a stale database
    (r2 review finding). ~0.4 s/GB; the input is already parsed when
    resume is evaluated, so this adds no I/O."""
    import hashlib
    h = hashlib.sha256()
    for c in code_chunks:
        h.update(np.ascontiguousarray(c).tobytes())
    h.update(np.ascontiguousarray(np.asarray(lengths, np.int64)).tobytes())
    for t in titles:
        h.update(t.encode("utf-8", "replace"))
        h.update(b"\0")
    return h.hexdigest()

# Length quantization: (max_len, multiple). The ragged tile kernel made
# chunk-shape diversity free (one compiled shape per DB regardless), so
# lengths quantize to the kernel's 32-step tile granularity everywhere —
# measured 3.3 points less DB padding than the earlier coarse ladder that
# existed to bound per-chunk compiled shapes.
_LEN_QUANTA = ((1 << 30, 32),)


def quantize_len(L: int) -> int:
    for cap, q in _LEN_QUANTA:
        if L <= cap:
            return max(q, ((L + q - 1) // q) * q)
    raise AssertionError


@dataclass
class DbChunk:
    """One rectangular pack: n_blocks blocks of V lanes, all padded to L."""
    chunk_id: int
    L: int                 # padded sequence length
    V: int                 # lanes per block
    n_blocks: int
    base: int              # first sorted-sequence index covered by this chunk
    n_seqs: int            # true sequences in this chunk (rest are pad lanes)
    codes: np.ndarray = field(repr=False)  # int8 (n_blocks, L, V)

    @property
    def padded_cells_per_query_residue(self) -> int:
        return self.n_blocks * self.L * self.V


@dataclass(eq=False)  # identity semantics: lets engines weak-cache per-DB device state
class PackedDb:
    """In-memory handle to a packed database (memmap-backed when loaded)."""
    chunks: list
    lengths: np.ndarray     # int32, per sequence in sorted order
    orig_index: np.ndarray  # int64, sorted position -> original FASTA position
    titles: list
    manifest: dict

    @property
    def n_seqs(self) -> int:
        return int(self.manifest["n_seqs"])

    @property
    def total_residues(self) -> int:
        return int(self.manifest["total_residues"])

    def title_of_sorted(self, sorted_idx: int) -> str:
        return self.titles[sorted_idx]

    def flat_tiles(self, jt: int = 32):
        """The whole database as ONE block-major stream of (jt, V) tiles for
        ops.pallas_scorer.score_tiles — every block of every chunk rides a
        single ragged kernel dispatch (one compiled shape per DB, instead of
        one per chunk shape).

        Returns (tiles, outrow, n_rows):
          tiles:  (T, jt, V) int8, each block's L/jt tiles consecutive,
                  blocks in chunk order (same flat-lane order as the
                  concatenated per-chunk scores);
          outrow: (T,) int32 tile -> global block row, nondecreasing;
          n_rows: total block count.
        Cached on the instance (host arrays; device upload is the engine's
        concern).
        """
        cached = getattr(self, "_flat_tiles_cache", None)
        if cached is not None and cached[0] == jt:
            return cached[1]
        parts, rows = [], []
        row = 0
        for ch in self.chunks:
            nb, L, V = ch.n_blocks, ch.L, ch.V
            assert L % jt == 0, (L, jt)
            parts.append(np.ascontiguousarray(ch.codes).reshape(-1, jt, V))
            rows.append(np.repeat(np.arange(row, row + nb, dtype=np.int32),
                                  L // jt))
            row += nb
        tiles = np.concatenate(parts) if parts else \
            np.zeros((0, jt, self.manifest["V"]), np.int8)
        outrow = np.concatenate(rows) if rows else np.zeros(0, np.int32)
        result = (tiles, outrow, row)
        self._flat_tiles_cache = (jt, result)
        return result

    def lane_maps(self):
        """Per flat lane (block-row-major, V lanes per row): validity mask
        and sorted-db index. Shared by the fused serving path and the
        sharded tile path. Returns (mask bool (n_rows*V,), lane2sorted
        int32 (n_rows*V,)); pad lanes map to index 0 and mask False."""
        cached = getattr(self, "_lane_maps_cache", None)
        if cached is not None:
            return cached
        V = int(self.manifest["V"])
        n = self.n_seqs
        masks, l2s = [], []
        for ch in self.chunks:
            nlane = ch.n_blocks * ch.V
            m = np.zeros(nlane, dtype=bool)
            m[:ch.n_seqs] = True
            masks.append(m)
            l2s.append(np.minimum(np.arange(nlane), max(ch.n_seqs - 1, 0))
                       + ch.base)
        mask = np.concatenate(masks) if masks else np.zeros(0, bool)
        lane2sorted = (np.concatenate(l2s).astype(np.int32)
                       if l2s else np.zeros(0, np.int32))
        self._lane_maps_cache = (mask, lane2sorted)
        return self._lane_maps_cache

    def seq_codes(self, sorted_idx: int) -> np.ndarray:
        """Recover one sequence's residue codes from the packed chunks
        (used by the traceback pass on top-k hits and by oracle spot
        checks — no FASTA re-read needed)."""
        if not 0 <= sorted_idx < self.n_seqs:
            raise IndexError(sorted_idx)
        L = int(self.lengths[sorted_idx])
        for ch in self.chunks:
            if ch.base <= sorted_idx < ch.base + ch.n_seqs:
                k = sorted_idx - ch.base
                blk, lane = divmod(k, ch.V)
                return np.asarray(ch.codes[blk, :L, lane], dtype=np.uint8)
        raise IndexError(sorted_idx)

    def block_max_lengths(self) -> np.ndarray:
        """Per global block row, the longest TRUE sequence length in it
        (sequences are length-sorted ascending, so it's the last real lane).
        Used for provable per-block score upper bounds (precision ladder
        tier truncation, BASELINE config 5)."""
        cached = getattr(self, "_block_maxlen_cache", None)
        if cached is not None:
            return cached
        out = []
        n = self.n_seqs
        for ch in self.chunks:
            for b in range(ch.n_blocks):
                lo = ch.base + b * ch.V
                hi = min(lo + ch.V, n)
                out.append(int(self.lengths[hi - 1]) if hi > lo else 0)
        res = np.asarray(out, dtype=np.int64)
        self._block_maxlen_cache = res
        return res


def build_db(records, out_dir, V: int = 128, resume: bool = False,
             use_native: bool = True) -> PackedDb:
    """Pack FASTA records (iterable of FastaRecord, or a FASTA path).

    Mirrors the reference preprocess call stack (SURVEY.md section 4.1):
    load -> encode -> sort by length ASC -> V-lane blocks -> chunks -> write.

    Given a FASTA path, the native C parser/packer (csrc/swpack.c, parity
    with the reference's C preprocess) is used when available; the Python
    path is the behavioral reference and fallback.

    resume=True: if a completed pack of the same sequence count and lane
    width already exists at out_dir, reuse it (SURVEY.md section 6.4: the
    packed DB is a cached, versioned input; per-shard files make rebuilds
    restartable).
    """
    if isinstance(records, (str, os.PathLike)):
        from swimm_tpu.fasta import is_gzip
        if use_native and not is_gzip(records):
            # gzip inputs go through the Python parser (the native C
            # packer reads the file directly; parity tests pin the two
            # parsers to identical plain-text behavior)
            try:
                from swimm_tpu import native
                if native.available():
                    return _build_db_native(records, out_dir, V, resume)
            except Exception:
                pass
        records = list(iter_fasta(records))
    elif not isinstance(records, (list, tuple)):
        records = list(records)   # materialize generators: the length
        # pass below iterates twice and records is indexed by sort order
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    digest = None
    if resume and (out / "manifest.json").exists():
        try:
            existing = load_db(out)
            digest = _input_digest((r.codes for r in records),
                                   [r.length for r in records],
                                   (r.title for r in records))
            if (existing.n_seqs == len(records)
                    and existing.manifest["V"] == V
                    and existing.manifest.get("input_digest") == digest):
                return existing
        except Exception:
            pass  # fall through to a clean rebuild

    lengths = np.array([r.length for r in records], dtype=np.int32)
    order = np.argsort(lengths, kind="stable")
    n = len(records)
    n_blocks_total = (n + V - 1) // V

    # Plan blocks: block b covers sorted positions [b*V, (b+1)*V).
    block_L = np.zeros(n_blocks_total, dtype=np.int64)
    for b in range(n_blocks_total):
        hi = min((b + 1) * V, n)
        max_len = int(lengths[order[b * V:hi]].max()) if hi > b * V else 1
        block_L[b] = quantize_len(max_len)

    # Group consecutive equal-L blocks into chunks.
    chunks: list[DbChunk] = []
    chunk_descs = []
    b = 0
    cid = 0
    while b < n_blocks_total:
        L = int(block_L[b])
        e = b
        while e < n_blocks_total and block_L[e] == L:
            e += 1
        nb = e - b
        codes = np.full((nb, L, V), PAD_CODE, dtype=np.int8)
        base = b * V
        n_seqs_chunk = min(e * V, n) - base
        for k in range(n_seqs_chunk):
            rec = records[order[base + k]]
            blk, lane = divmod(k, V)
            codes[blk, :rec.length, lane] = rec.codes.astype(np.int8)
        fname = f"chunk_{cid:04d}.npy"
        np.save(out / fname, codes)
        chunk_descs.append({
            "chunk_id": cid, "L": L, "V": V, "n_blocks": nb,
            "base": base, "n_seqs": n_seqs_chunk, "file": fname,
        })
        chunks.append(DbChunk(cid, L, V, nb, base, n_seqs_chunk, codes))
        cid += 1
        b = e

    sorted_lengths = lengths[order].astype(np.int32)
    np.save(out / "lengths.npy", sorted_lengths)
    np.save(out / "orig_index.npy", order.astype(np.int64))
    with open(out / "titles.txt", "w") as fh:
        for i in order:
            fh.write(records[i].title.replace("\n", " ") + "\n")

    if digest is None:
        digest = _input_digest((r.codes for r in records),
                               [r.length for r in records],
                               (r.title for r in records))
    manifest = {
        "format_version": FORMAT_VERSION,
        "n_seqs": n,
        "total_residues": int(lengths.sum()),
        "V": V,
        "n_chunks": len(chunk_descs),
        "chunks": chunk_descs,
        "len_quanta": [list(t) for t in _LEN_QUANTA],
        "input_digest": digest,
    }
    with open(out / "manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=1)

    titles = [records[i].title for i in order]
    return PackedDb(chunks, sorted_lengths, order.astype(np.int64), titles, manifest)


def load_db(db_dir, mmap: bool = True) -> PackedDb:
    """Load a packed database; chunk arrays are memmapped by default
    (parity: C4 mmap/fread loader, SURVEY.md section 3)."""
    d = Path(db_dir)
    with open(d / "manifest.json") as fh:
        manifest = json.load(fh)
    if manifest["format_version"] != FORMAT_VERSION:
        raise ValueError(f"unsupported db format_version {manifest['format_version']}")
    mode = "r" if mmap else None
    chunks = []
    for cd in manifest["chunks"]:
        codes = np.load(d / cd["file"], mmap_mode=mode)
        chunks.append(DbChunk(cd["chunk_id"], cd["L"], cd["V"], cd["n_blocks"],
                              cd["base"], cd["n_seqs"], codes))
    lengths = np.load(d / "lengths.npy")
    orig_index = np.load(d / "orig_index.npy")
    with open(d / "titles.txt") as fh:
        titles = [line.rstrip("\n") for line in fh]
    return PackedDb(chunks, lengths, orig_index, titles, manifest)


def _build_db_native(fasta_path, out_dir, V: int, resume: bool) -> PackedDb:
    """Native-parser fast path of build_db (same on-disk format)."""
    from swimm_tpu import native

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    codes_blob, offsets, lengths, titles_all = native.parse_fasta(fasta_path)
    n = len(lengths)
    digest = _input_digest([codes_blob], lengths, titles_all)
    if resume and (out / "manifest.json").exists():
        try:
            existing = load_db(out)
            # same validation as the Python path: a stale pack of a
            # DIFFERENT input must never be silently reused — the digest
            # covers residue content + lengths + titles
            if (existing.manifest["V"] == V
                    and existing.n_seqs == n
                    and existing.manifest.get("input_digest") == digest):
                return existing
        except Exception:
            pass
    order = np.argsort(lengths, kind="stable").astype(np.int64)
    sorted_lengths = lengths[order].astype(np.int32)
    n_blocks_total = (n + V - 1) // V

    # per-block quantized length (vectorized: block max over sorted lens)
    padded = np.zeros(n_blocks_total * V, dtype=np.int64)
    padded[:n] = sorted_lengths
    block_max = padded.reshape(n_blocks_total, V).max(axis=1)
    block_L = np.array([quantize_len(int(max(m, 1))) for m in block_max],
                       dtype=np.int64)

    chunks: list[DbChunk] = []
    chunk_descs = []
    b = 0
    cid = 0
    while b < n_blocks_total:
        L = int(block_L[b])
        e = b
        while e < n_blocks_total and block_L[e] == L:
            e += 1
        base = b * V
        n_seqs_chunk = min(e * V, n) - base
        codes = native.fill_chunk(codes_blob, offsets, lengths,
                                  order[base:base + n_seqs_chunk],
                                  L, V, PAD_CODE)
        nb_full = e - b
        if codes.shape[0] < nb_full:   # trailing all-pad blocks
            pad = np.full((nb_full - codes.shape[0], L, V), PAD_CODE,
                          dtype=np.int8)
            codes = np.concatenate([codes, pad], axis=0)
        fname = f"chunk_{cid:04d}.npy"
        np.save(out / fname, codes)
        chunk_descs.append({
            "chunk_id": cid, "L": L, "V": V, "n_blocks": nb_full,
            "base": base, "n_seqs": n_seqs_chunk, "file": fname,
        })
        chunks.append(DbChunk(cid, L, V, nb_full, base, n_seqs_chunk, codes))
        cid += 1
        b = e

    np.save(out / "lengths.npy", sorted_lengths)
    np.save(out / "orig_index.npy", order)
    with open(out / "titles.txt", "w") as fh:
        for i in order:
            fh.write(titles_all[i].replace("\n", " ") + "\n")

    manifest = {
        "format_version": FORMAT_VERSION,
        "n_seqs": n,
        "total_residues": int(lengths.sum()),
        "V": V,
        "n_chunks": len(chunk_descs),
        "chunks": chunk_descs,
        "len_quanta": [list(t) for t in _LEN_QUANTA],
        "input_digest": digest,
    }
    with open(out / "manifest.json", "w") as fh:
        json.dump(manifest, fh, indent=1)

    titles = [titles_all[i] for i in order]
    return PackedDb(chunks, sorted_lengths, order, titles, manifest)
