#!/usr/bin/env python3
"""Extract the CELT static mode tables from the libopus test oracle.

A from-scratch Opus/CELT decoder needs the trained/generated mode data
(RFC 6716 appendices; celt/static_modes_float.h and quant_bands.c in
libopus).  The RFC text is unreachable offline, but the image ships
libopus 1.3.1 as a TEST ORACLE (pygame bundle) and every table is plain
data in its .rodata — the same route that recovered the NMS ADPCM
predictor (DEVNOTES "Round 4d").  This tool locates each table by an
anchoring byte pattern (values that are also independently known, e.g.
the band layout and the allocation-table structure), validates its
structural invariants, and emits `native/celt_tables.inc`.

Anchors and offsets were verified against libopus-56ba99ed.so.0.8.0
(libopus 1.3.1); the tool re-locates by pattern so a different build of
the same data still extracts.
"""
import glob
import math
import re
import struct
import sys

import numpy as np

OUT = "native/celt_tables.inc"


def find_opus():
    cands = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/libopus*.so*"))
    if not cands:
        raise SystemExit("no libopus oracle in image")
    return cands[0]


def main():
    blob = open(find_opus(), "rb").read()

    def find(pat, what):
        hits = [m.start() for m in re.finditer(re.escape(pat), blob)]
        if not hits:
            raise SystemExit(f"anchor for {what} not found")
        return hits[0]

    # Band layout (eband5ms): independently known from the Opus spec;
    # the match doubles as a "this is really CELT mode data" check.
    eband = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 34,
             40, 48, 60, 78, 100]
    base = find(struct.pack("<22h", *eband), "eband5ms")

    # logN400 (log2 band widths in 1/8 bits at 400 Hz frames).
    logn_off = find(struct.pack(
        "<21h", *[0, 0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 16, 16, 16, 21,
                  21, 24, 29, 34, 36]), "logN400")
    logn = list(struct.unpack_from("<21h", blob, logn_off))

    # cache_index50: 5 rows x 21 bands of offsets into cache_bits50,
    # -1 for width-1 bands in row 0.  Located right before logN400 in
    # the static mode object; anchored by its first row.
    row0 = [-1] * 8 + [0] * 4 + [41] * 3 + [82] * 2 + [123, 164, 200, 222]
    ci_off = find(struct.pack("<21h", *row0), "cache_index50")
    cache_index = list(struct.unpack_from("<105h", blob, ci_off))
    assert all(-1 <= v < 392 for v in cache_index)

    # cache_bits50: 392 bytes of variable-length pulse-cache records
    # ([len, cumulative 1/8-bit costs...]).  First record is the N=1
    # cache: 40 entries of 7 (one sign bit each).
    cb_off = find(bytes([40] + [7] * 40 + [40, 15, 23]), "cache_bits50")
    cache_bits = list(blob[cb_off:cb_off + 392])
    # N=2 record must match log2 of the PVQ vector counts V(2,k).
    v_prev, v_cur = [1] + [0] * 49, []  # V(0,k): 1 at k=0 else 0
    for n in range(1, 3):
        v_cur = [1]
        for k in range(1, 45):
            v_cur.append(v_cur[k - 1] + v_prev[k - 1] + v_prev[k])
        v_prev = v_cur
    for k in (1, 2, 3):
        want = round(math.log2(v_cur[k]) * 8) - 1
        got = cache_bits[41 + k]  # record = [len=40, costs for k=1..40]
        assert abs(got - want) <= 1, (k, got, want)

    # cache_caps50: 8 rows x 21 (LM 0-3 x mono/stereo max allocations).
    cc_off = find(bytes([224] * 8 + [160] * 4 + [185] * 3 + [178] * 2 +
                        [168, 134, 61, 37]), "cache_caps50")
    cache_caps = list(blob[cc_off:cc_off + 168])

    # band_allocation: 11 quality rows x 21 bands (bits/sample targets).
    ba_off = find(bytes([90, 80, 75, 69, 63, 56, 49, 40, 34, 29]),
                  "band_allocation") - 21
    band_alloc = list(blob[ba_off:ba_off + 231])
    assert band_alloc[:21] == [0] * 21

    # e_prob_model[4][2][42]: coarse-energy Laplace model.
    ep_off = find(bytes([72, 127, 65, 129, 66, 128]), "e_prob_model")
    e_prob = list(blob[ep_off:ep_off + 672])

    # window120: must equal the spec formula (validates float layout).
    w = [math.sin(0.5 * math.pi *
                  math.sin(0.5 * math.pi * (i + 0.5) / 120.0) ** 2)
         for i in range(120)]
    w_off = find(struct.pack("<2f", np.float32(w[0]), np.float32(w[1])),
                 "window120")
    got_w = struct.unpack_from("<120f", blob, w_off)
    assert np.allclose(got_w, w, atol=1e-7)

    # LOG2_FRAC_TABLE (rate.c), checked present.
    l2f = [0, 8, 13, 16, 19, 21, 23, 24, 26, 27, 28, 29, 30, 31, 32, 32,
           33, 34, 34, 35, 36, 36, 37, 37]
    find(bytes(l2f), "LOG2_FRAC_TABLE")

    # Small icdf tables, checked present in the binary.
    find(bytes([25, 23, 2]), "spread_icdf")
    find(bytes([126, 124, 119, 109, 87, 41, 19, 9, 4, 2]), "trim_icdf")

    def fmt(name, typ, vals, per=12):
        lines = [f"static const {typ} {name}[{len(vals)}] = {{"]
        for i in range(0, len(vals), per):
            lines.append("    " + ", ".join(str(v) for v in
                                            vals[i:i + per]) + ",")
        lines.append("};")
        return "\n".join(lines)

    parts = [
        "// Generated by tools/gen_celt_tables.py from the libopus test",
        "// oracle binary -- do not edit.  See that tool for provenance.",
        "",
        fmt("kEBands", "int16_t", eband),
        fmt("kLogN", "int16_t", logn),
        fmt("kCacheIndex", "int16_t", cache_index),
        fmt("kCacheBits", "uint8_t", cache_bits),
        fmt("kCacheCaps", "uint8_t", cache_caps),
        fmt("kBandAlloc", "uint8_t", band_alloc),
        fmt("kEProbModel", "uint8_t", e_prob),
        fmt("kLog2FracTable", "uint8_t", l2f),
        "",
    ]
    open(OUT, "w").write("\n".join(parts))
    print(f"wrote {OUT}: eband@{hex(base)} cache_bits@{hex(cb_off)} "
          f"caps@{hex(cc_off)} alloc@{hex(ba_off)} eprob@{hex(ep_off)}")


if __name__ == "__main__":
    sys.exit(main())
