"""Reference-mount re-verification hook (SURVEY.md §0 standing instruction).

SURVEY.md and VERDICT.md were written against an EMPTY `/root/reference`
mount (verified rounds 1-2); every capability row is reconstructed from
BASELINE.json + the published papers. If the mount is EVER populated, the
reconstruction must be re-verified against the real code before building on
it — this test turns that standing instruction into a structural check that
fails loudly instead of relying on someone remembering.
"""

import os

import pytest


def test_reference_mount_still_empty():
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return  # no mount at all: nothing to re-verify
    if os.environ.get("SWTPU_ALLOW_POPULATED_REFERENCE"):
        pytest.skip("populated /root/reference explicitly allowed via "
                    "SWTPU_ALLOW_POPULATED_REFERENCE (e.g. a review/CI "
                    "image that mounts the upstream source)")
    found = []
    for root, _dirs, files in os.walk(ref):
        found.extend(os.path.join(root, f) for f in files)
        if len(found) > 5:
            break
    assert not found, (
        "/root/reference is now POPULATED ({} ... ). SURVEY.md §1-§6 and "
        "VERDICT.md's coverage table were reconstructed against an empty "
        "mount — re-verify them against the real code and replace "
        "provenance tags with real file:line cites before trusting any "
        "parity claim (SURVEY.md §0).".format(found[:3]))
