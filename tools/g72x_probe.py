"""Scratch harness for behaviorally recovering the G.72x ADPCM family.

The reference convolves AU/G.721, AU/G.723 (24/40 kbps) and WAV/G.721
via libsndfile.  The decoders are fully specified by CCITT G.721/G.723
(now G.726) integer arithmetic; this tool iterates a pure-python
decoder against oracle-decoded probe files until every probe matches
sample-exactly, then the converged semantics get ported to
native/g72x_codec.cc.

Oracle quirk: the bundled libsndfile CRASHES in sf_close for g72x
handles (read or write) — every oracle call runs in a subprocess that
ends with os._exit(0).

Not imported by the package — development tooling only.
"""

import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

# ------------------------------------------------------------------ oracle IO

_ORACLE_SNIPPET = r"""
import ctypes, glob, os, sys
import numpy as np
cands = sorted(glob.glob("/opt/venv/lib/python3*/site-packages/pygame.libs/libsndfile*.so*"))
for dep in sorted(glob.glob(os.path.join(os.path.dirname(cands[0]), "*.so*"))):
    if "sndfile" not in dep:
        try: ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
        except OSError: pass
lib = ctypes.CDLL(cands[0])
class SfInfo(ctypes.Structure):
    _fields_=[("frames",ctypes.c_int64),("samplerate",ctypes.c_int),("channels",ctypes.c_int),
              ("format",ctypes.c_int),("sections",ctypes.c_int),("seekable",ctypes.c_int)]
lib.sf_open.restype = ctypes.c_void_p
lib.sf_open.argtypes=[ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(SfInfo)]
for f in ("sf_writef_short", "sf_readf_short"):
    getattr(lib, f).restype = ctypes.c_int64
    getattr(lib, f).argtypes=[ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
lib.sf_command.argtypes=[ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
mode = sys.argv[1]
path = sys.argv[2].encode()
if mode == "enc":
    fmt = int(sys.argv[3], 0); rate = int(sys.argv[4]); ch = int(sys.argv[5])
    x = np.load(sys.argv[6])
    info = SfInfo(frames=0, samplerate=rate, channels=ch, format=fmt)
    snd = lib.sf_open(path, 0x20, ctypes.byref(info))
    assert snd, "oracle sf_open write failed"
    n = x.shape[0]
    assert lib.sf_writef_short(snd, np.ascontiguousarray(x, np.int16).ctypes.data, n) == n
    lib.sf_command(snd, 0x1060, None, 0)  # SFC_UPDATE_HEADER_NOW
    os.fsync(0) if False else None
else:
    info = SfInfo()
    snd = lib.sf_open(path, 0x10, ctypes.byref(info))
    assert snd, "oracle sf_open read failed"
    out = np.zeros((max(int(info.frames), 1), info.channels), np.int16)
    got = lib.sf_readf_short(snd, out.ctypes.data, info.frames)
    np.save(sys.argv[3], out[:got])
sys.stdout.flush()
os._exit(0)  # sf_close crashes for g72x handles in this build
"""


def oracle_encode(x: np.ndarray, fmt: int, rate: int = 8000) -> bytes:
    if x.ndim == 1:
        x = x[:, None]
    with tempfile.TemporaryDirectory() as d:
        xp = os.path.join(d, "x.npy")
        out = os.path.join(d, "out.bin")
        np.save(xp, np.asarray(x, np.int16))
        subprocess.run(
            [sys.executable, "-c", _ORACLE_SNIPPET, "enc", out, hex(fmt),
             str(rate), str(x.shape[1]), xp],
            check=True,
        )
        return open(out, "rb").read()


def oracle_decode(blob: bytes) -> np.ndarray:
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "in.bin")
        yp = os.path.join(d, "y.npy")
        open(p, "wb").write(blob)
        subprocess.run(
            [sys.executable, "-c", _ORACLE_SNIPPET, "dec", p, yp],
            check=True,
        )
        return np.load(yp)


# ------------------------------------------------- python G.726 prototype

_POWER2 = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384]


def _quan(val, table):
    for i, t in enumerate(table):
        if val < t:
            return i
    return len(table)


def _fmult(an, srn):
    anmag = an if an > 0 else (-an) & 0x1FFF
    anexp = _quan(anmag, _POWER2) - 6
    if anmag == 0:
        anmant = 32
    elif anexp >= 0:
        anmant = anmag >> anexp
    else:
        anmant = anmag << -anexp
    wanexp = anexp + ((srn >> 6) & 0xF) - 13
    wanmant = (anmant * (srn & 0x3F) + 0x30) >> 4
    if wanexp >= 0:
        retval = (wanmant << wanexp) & 0x7FFF
    else:
        retval = wanmant >> -wanexp
    return -retval if (an ^ srn) < 0 else retval


class G72xState:
    def __init__(self):
        self.yl = 34816
        self.yu = 544
        self.dms = 0
        self.dml = 0
        self.ap = 0
        self.a = [0, 0]
        self.b = [0] * 6
        self.pk = [0, 0]
        self.dq = [32] * 6
        self.sr = [32, 32]
        self.td = 0

    def predictor_zero(self):
        sezi = _fmult(self.b[0] >> 2, self.dq[0])
        for i in range(1, 6):
            sezi += _fmult(self.b[i] >> 2, self.dq[i])
        return sezi

    def predictor_pole(self):
        return (_fmult(self.a[1] >> 2, self.sr[1]) +
                _fmult(self.a[0] >> 2, self.sr[0]))

    def step_size(self):
        if self.ap >= 256:
            return self.yu
        y = self.yl >> 6
        dif = self.yu - y
        al = self.ap >> 2
        if dif > 0:
            y += (dif * al) >> 6
        elif dif < 0:
            y += (dif * al + 0x3F) >> 6
        return y

    def update(self, code_size, y, wi, fi, dq, sr, dqsez):
        pk0 = 1 if dqsez < 0 else 0
        mag = dq & 0x7FFF

        ylint = self.yl >> 15
        ylfrac = (self.yl >> 10) & 0x1F
        thr1 = (32 + ylfrac) << ylint
        thr2 = thr1 if ylint <= 9 else 31 << 10
        dqthr = (thr2 + (thr2 >> 1)) >> 1
        if not self.td:
            tr = 0
        elif mag <= dqthr:
            tr = 0
        else:
            tr = 1

        self.yu = y + ((wi - y) >> 5)
        if self.yu < 544:
            self.yu = 544
        elif self.yu > 5120:
            self.yu = 5120
        self.yl += self.yu + ((-self.yl) >> 6)

        if tr == 1:
            self.a = [0, 0]
            self.b = [0] * 6
        else:
            pks1 = pk0 ^ self.pk[0]
            a2p = self.a[1] - (self.a[1] >> 7)
            if dqsez != 0:
                fa1 = self.a[0] if pks1 else -self.a[0]
                if fa1 < -8191:
                    a2p -= 0x100
                elif fa1 > 8191:
                    a2p += 0xFF
                else:
                    a2p += fa1 >> 5
                if pk0 ^ self.pk[1]:
                    if a2p <= -12160:
                        a2p = -12288
                    elif a2p >= 12416:
                        a2p = 12288
                    else:
                        a2p -= 0x80
                elif a2p <= -12416:
                    a2p = -12288
                elif a2p >= 12160:
                    a2p = 12288
                else:
                    a2p += 0x80
            self.a[1] = a2p
            self.a[0] -= self.a[0] >> 8
            if dqsez != 0:
                if pks1 == 0:
                    self.a[0] += 192
                else:
                    self.a[0] -= 192
            a1ul = 15360 - a2p
            if self.a[0] < -a1ul:
                self.a[0] = -a1ul
            elif self.a[0] > a1ul:
                self.a[0] = a1ul
            for i in range(6):
                if code_size == 5:  # 40 kbps: faster leak
                    self.b[i] -= self.b[i] >> 9
                else:
                    self.b[i] -= self.b[i] >> 8
                if mag:
                    if (dq ^ self.dq[i]) >= 0:
                        self.b[i] += 128
                    else:
                        self.b[i] -= 128

        for i in range(5, 0, -1):
            self.dq[i] = self.dq[i - 1]
        if mag == 0:
            self.dq[0] = 0x20 if dq >= 0 else 0xFC20 - 0x10000
        else:
            exp = _quan(mag, _POWER2)
            if dq >= 0:
                self.dq[0] = (exp << 6) + ((mag << 6) >> exp)
            else:
                self.dq[0] = (exp << 6) + ((mag << 6) >> exp) - 0x400

        self.sr[1] = self.sr[0]
        if sr == 0:
            self.sr[0] = 0x20
        elif sr > 0:
            exp = _quan(sr, _POWER2)
            self.sr[0] = (exp << 6) + ((sr << 6) >> exp)
        elif sr > -32768:
            mag2 = -sr
            exp = _quan(mag2, _POWER2)
            self.sr[0] = (exp << 6) + ((mag2 << 6) >> exp) - 0x400
        else:
            self.sr[0] = 0xFC20 - 0x10000

        self.pk[1] = self.pk[0]
        self.pk[0] = pk0

        if tr == 1:
            self.td = 0
        elif self.a[1] < -11776:
            self.td = 1
        else:
            self.td = 0

        self.dms += (fi - self.dms) >> 5
        self.dml += (((fi << 2) - self.dml) >> 7)
        if tr == 1:
            self.ap = 256
        elif y < 1536:
            self.ap += (0x200 - self.ap) >> 4
        elif self.td:
            self.ap += (0x200 - self.ap) >> 4
        elif abs((self.dms << 2) - self.dml) >= (self.dml >> 3):
            self.ap += (0x200 - self.ap) >> 4
        else:
            self.ap += (-self.ap) >> 4


def _reconstruct(sign, dqln, y):
    dql = dqln + (y >> 2)
    if dql < 0:
        return -0x8000 if sign else 0
    dex = (dql >> 7) & 15
    dqt = 128 + (dql & 127)
    dq = (dqt << 7) >> (14 - dex)
    return (dq - 0x8000) if sign else dq


# G.721 (32 kbps, 4-bit) tables
_DQLN_721 = [-2048, 4, 135, 213, 273, 323, 373, 425,
             425, 373, 323, 273, 213, 135, 4, -2048]
_WI_721 = [-12, 18, 41, 64, 112, 198, 355, 1122,
           1122, 355, 198, 112, 64, 41, 18, -12]
_FI_721 = [0, 0, 0, 0x200, 0x200, 0x200, 0x600, 0xE00,
           0xE00, 0x600, 0x200, 0x200, 0x200, 0, 0, 0]

# G.723_24 (24 kbps, 3-bit)
_DQLN_723_24 = [-2048, 135, 273, 373, 373, 273, 135, -2048]
_WI_723_24 = [-128, 960, 4384, 18624, 18624, 4384, 960, -128]
_FI_723_24 = [0, 0x200, 0x400, 0xE00, 0xE00, 0x400, 0x200, 0]

# G.723_40 (40 kbps, 5-bit)
_DQLN_723_40 = [-2048, -66, 28, 104, 169, 224, 274, 318,
                358, 395, 429, 459, 488, 514, 539, 566,
                566, 539, 514, 488, 459, 429, 395, 358,
                318, 274, 224, 169, 104, 28, -66, -2048]
_WI_723_40 = [448, 448, 768, 1248, 1280, 1312, 1856, 3200,
              4512, 5728, 7008, 8960, 11456, 14080, 16928, 22272,
              22272, 16928, 14080, 11456, 8960, 7008, 5728, 4512,
              3200, 1856, 1312, 1280, 1248, 768, 448, 448]
_FI_723_40 = [0, 0, 0, 0, 0, 0x200, 0x200, 0x200,
              0x200, 0x200, 0x400, 0x600, 0x800, 0xA00, 0xC00, 0xC00,
              0xC00, 0xC00, 0xA00, 0x800, 0x600, 0x400, 0x200, 0x200,
              0x200, 0x200, 0x200, 0, 0, 0, 0, 0]


def decode_code(state: G72xState, code: int, bits: int) -> int:
    sezi = state.predictor_zero()
    sez = sezi >> 1
    sei = sezi + state.predictor_pole()
    se = sei >> 1
    y = state.step_size()
    if bits == 4:
        code &= 0xF
        sign = code & 8
        dqln, wi, fi = _DQLN_721[code], _WI_721[code] << 5, _FI_721[code]
    elif bits == 3:
        code &= 7
        sign = code & 4
        dqln, wi, fi = _DQLN_723_24[code], _WI_723_24[code], _FI_723_24[code]
    else:
        code &= 0x1F
        sign = code & 0x10
        dqln, wi, fi = _DQLN_723_40[code], _WI_723_40[code], _FI_723_40[code]
    dq = _reconstruct(sign, dqln, y)
    sr = (se - (dq & 0x3FFF)) if dq < 0 else (se + dq)
    dqsez = sr + sez - se
    state.update(bits + (1 if bits == 4 else 0) if False else
                 {4: 4, 3: 3, 5: 5}[bits], y, wi, fi, dq, sr, dqsez)
    # output: 16-bit linear = sr << 2
    v = sr << 2
    if v > 32767:
        v = 32767
    elif v < -32768:
        v = -32768
    return v


def unpack_codes(payload: bytes, bits: int) -> list:
    """AU G.72x code packing (to be confirmed against the oracle)."""
    codes = []
    acc = 0
    nb = 0
    for byte in payload:
        acc |= byte << nb
        nb += 8
        while nb >= bits:
            codes.append(acc & ((1 << bits) - 1))
            acc >>= bits
            nb -= bits
    return codes


def decode_au_g72x(blob: bytes, bits: int) -> np.ndarray:
    offset, size, enc, rate, ch = struct.unpack(">IIIII", blob[4:24])
    payload = blob[offset:offset + size]
    st = G72xState()
    out = [decode_code(st, c, bits) for c in unpack_codes(payload, bits)]
    return np.array(out, np.int16)


def main():
    rng = np.random.default_rng(1)
    n = 2000
    t = np.arange(n)
    probes = {
        "ramp": (100 * np.sin(t * 0.05)).astype(np.int16),
        "noise": rng.integers(-3000, 3000, n).astype(np.int16),
        "loud": (20000 * np.sin(t * 0.3)).astype(np.int16),
        "quiet": rng.integers(-20, 20, n).astype(np.int16),
    }
    for fmt, bits, name in [(0x30030, 4, "g721"), (0x30031, 3, "g723_24"),
                            (0x30032, 5, "g723_40")]:
        for pname, x in probes.items():
            blob = oracle_encode(x, fmt)
            want = oracle_decode(blob)[:, 0]
            got = decode_au_g72x(blob, bits)
            m = min(len(want), len(got))
            eq = int(np.sum(want[:m] == got[:m]))
            print(f"{name} {pname}: n_oracle={len(want)} n_us={len(got)} "
                  f"match={eq}/{m}"
                  + ("  OK" if eq == m and m > 0 else
                     f"  first_mismatch={np.argmin(want[:m] == got[:m])}"))


if __name__ == "__main__":
    main()
