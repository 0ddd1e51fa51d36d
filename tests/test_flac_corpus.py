"""Bit-validate the from-scratch FLAC decoder against a vendored
third-party-encoded corpus (libsndfile/libFLAC — the reference's own
codec stack, reference Makefile:14-19).

The round-trip tests in test_flac.py prove encoder<->decoder
consistency; this file proves the decoder reads bytes we did NOT
produce, catching self-consistent spec misreadings.  Regenerate with
folve_tpu/tools/make_flac_corpus.py.
"""

import hashlib
import json
import os

import numpy as np
import pytest

CORPUS = os.path.join(os.path.dirname(__file__), "data", "flac_corpus")

with open(os.path.join(CORPUS, "manifest.json")) as f:
    MANIFEST = json.load(f)


@pytest.mark.parametrize("name", sorted(MANIFEST))
def test_decodes_third_party_flac_bit_exact(name):
    from folve_tpu.audio.flac import FlacDecoder

    meta = MANIFEST[name]
    dec = FlacDecoder(os.path.join(CORPUS, name))
    info = dec.info
    assert info.rate == meta["rate"]
    assert info.channels == meta["channels"]
    assert info.bits_per_sample == meta["bits"]
    assert info.frames == meta["frames"]
    pcm = dec.read_int(meta["frames"] + 16)
    assert pcm.shape == (meta["frames"], meta["channels"])
    assert dec.read_int(16).shape[0] == 0  # clean EOF
    got = hashlib.sha256(
        np.ascontiguousarray(pcm.astype(np.int32)).tobytes()
    ).hexdigest()
    assert got == meta["pcm_sha256"], f"decode of {name} diverges"


def test_corpus_covers_the_interesting_corners():
    """The manifest must keep covering what it was built to cover."""
    bits = {m["bits"] for m in MANIFEST.values()}
    assert bits == {8, 16, 24}
    rates = {m["rate"] for m in MANIFEST.values()}
    assert len(rates) >= 4
    chans = {m["channels"] for m in MANIFEST.values()}
    assert chans == {1, 2}
    assert any("wasted" in n for n in MANIFEST)
    assert any("verbatim" in n for n in MANIFEST)
