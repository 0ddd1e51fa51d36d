"""Scratch harness for behaviorally recovering the ALAC bitstream.

Apple Lossless is decoded by libsndfile 1.1 (bundled Apple codec) for
the reference's accept-anything probe.  Since the codec is LOSSLESS,
any PCM we encode through the oracle must decode back bit-exactly —
that round-trip is the full specification of the decoder.  This tool
iterates a pure-python decoder against oracle-encoded probe files
until every corpus file round-trips; the converged semantics then get
ported to native/alac_codec.cc.

Not imported by the package — development tooling only.
"""

import struct
import sys

import numpy as np


# --------------------------------------------------------------------- CAF IO

def alac_file(path):
    """-> (config dict, packet list)"""
    blob = open(path, "rb").read()
    pos = 8
    kuki = pakt = data = None
    while pos + 12 <= len(blob):
        ctype = blob[pos:pos + 4]
        size = struct.unpack(">q", blob[pos + 4:pos + 12])[0]
        body = blob[pos + 12:pos + 12 + size]
        if ctype == b"kuki":
            kuki = body
        elif ctype == b"pakt":
            pakt = body
        elif ctype == b"data":
            data = body[4:]
        pos += 12 + size
    (frame_length, compat, bit_depth, pb, mb, kb, channels, max_run,
     max_frame_bytes, avg_rate, sample_rate) = struct.unpack(
        ">IBBBBBBHIII", kuki[:24])
    cfg = dict(frame_length=frame_length, bit_depth=bit_depth, pb=pb,
               mb=mb, kb=kb, channels=channels, max_run=max_run,
               sample_rate=sample_rate)
    n_pkts, n_valid, priming, remainder = struct.unpack(">qqii", pakt[:24])
    sizes = []
    i = 24
    for _ in range(n_pkts):
        v = 0
        while True:
            b = pakt[i]
            i += 1
            v = (v << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        sizes.append(v)
    pkts = []
    off = 0
    for s in sizes:
        pkts.append(data[off:off + s])
        off += s
    cfg["n_valid"] = n_valid
    return cfg, pkts


class Bits:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, n):
        v = 0
        for _ in range(n):
            byte = self.buf[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def peek32(self):
        v = 0
        for i in range(4):
            idx = (self.pos >> 3) + i
            v = (v << 8) | (self.buf[idx] if idx < len(self.buf) else 0)
        return (v << (self.pos & 7)) & 0xFFFFFFFF | (
            ((self.buf[(self.pos >> 3) + 4] if (self.pos >> 3) + 4 < len(self.buf) else 0)
             >> (8 - (self.pos & 7))) if self.pos & 7 else 0)


def lead_zeros32(x):
    if x == 0:
        return 32
    n = 0
    for i in range(31, -1, -1):
        if x & (1 << i):
            break
        n += 1
    return n


def lg3a(x):
    return 31 - lead_zeros32((x + 3) & 0xFFFFFFFF)


def sign_extend(v, bits):
    v &= (1 << bits) - 1
    if v & (1 << (bits - 1)):
        v -= 1 << bits
    return v


# ------------------------------------------------------- adaptive Golomb (ag)

QBSHIFT = 9
QB = 1 << QBSHIFT
MMULSHIFT = 2
MDENSHIFT = QBSHIFT - MMULSHIFT - 1          # 6
MOFF = 1 << (MDENSHIFT - 1)                  # 32
BITOFF = 24
N_MAX_MEAN_CLAMP = 0xFFFF
N_MEAN_CLAMP_VAL = 0xFFFF
MAX_PREFIX_16 = 9
MAX_PREFIX_32 = 9
MAX_DATATYPE_BITS_16 = 16


def dyn_get(bits, m, k):
    """16-bit variant: unary prefix of 1s, escape at MAX_PREFIX_16."""
    pre = 0
    while bits.read(1) == 1:
        pre += 1
        if pre >= MAX_PREFIX_16:
            return bits.read(MAX_DATATYPE_BITS_16)
    if k == 0:
        return pre
    v = bits.read(k - 1)
    if v < 1:
        return pre * m
    extra = bits.read(1)
    v = (v << 1) | extra
    return pre * m + v - 1


def dyn_get_32bit(bits, m, k, maxbits):
    pre = 0
    while bits.read(1) == 1:
        pre += 1
        if pre >= MAX_PREFIX_32:
            return bits.read(maxbits)
    if k == 0:
        return pre
    v = bits.read(k - 1)
    if v < 1:
        return pre * m
    extra = bits.read(1)
    v = (v << 1) | extra
    return pre * m + v - 1


def dyn_decomp(bits, npts, maxsize, mb0, pb, kb, wb, maxrun, trace=False):
    """Entropy-decode npts residuals."""
    out = [0] * npts
    mb = mb0
    zmode = 0
    c = 0
    while c < npts:
        m = mb >> QBSHIFT
        k = lg3a(m)
        k = min(k, kb)
        m = (1 << k) - 1
        n = dyn_get_32bit(bits, m, k, maxsize)
        # least-significant bit of (n + zmode) is the sign
        ndecode = n + zmode
        d = (ndecode + 1) >> 1
        out[c] = -d if ndecode & 1 else d
        c += 1
        if trace:
            print(f"  c={c-1} n={n} val={out[c-1]} mb={mb} k={k}")
        # meter update
        mb = pb * ndecode + mb - ((pb * mb) >> QBSHIFT)
        if ndecode > N_MAX_MEAN_CLAMP:
            mb = N_MEAN_CLAMP_VAL
        zmode = 0
        if (mb < 128) and (c < npts):
            zmode = 1
            k = 7 - (mb.bit_length() - 1 if mb > 0 else 0) + ((mb + 16) >> 6)
            k = min(k, kb)
            mz = (1 << k) - 1
            n = dyn_get(bits, mz, k)
            if c + n > npts:
                raise ValueError(f"zero run overruns: c={c} n={n}")
            for _ in range(n):
                out[c] = 0
                c += 1
            if n > 0xFFFF:
                zmode = 0
            mb = 0
    return out


# ------------------------------------------------------------- predictor (dp)

def unpc_block(inp, npts, coefs, denshift, chanbits):
    """In-place adaptive FIR un-prediction (returns new list)."""
    num = len(coefs)
    coefs = list(coefs)
    out = [0] * npts
    out[0] = inp[0]
    if num == 0:
        return list(inp), coefs
    if num == 31:  # pure first-order delta
        for j in range(1, npts):
            out[j] = sign_extend(inp[j] + out[j - 1], chanbits)
        return out, coefs
    for j in range(1, min(num + 1, npts)):
        out[j] = sign_extend(inp[j] + out[j - 1], chanbits)
    lim = num + 1
    denhalf = 1 << (denshift - 1) if denshift > 0 else 0
    for j in range(lim, npts):
        top = out[j - lim]
        sum1 = 0
        for i in range(num):
            sum1 += coefs[i] * (out[j - 1 - i] - top)
        del_ = inp[j]
        del0 = del_
        sgn_del = (del_ > 0) - (del_ < 0)
        val = del_ + top + ((sum1 + denhalf) >> denshift)
        out[j] = sign_extend(val, chanbits)
        # adaptive coefficient update
        if sgn_del > 0:
            for i in range(num - 1, -1, -1):
                dd = top - out[j - 1 - i]
                sgn = (dd > 0) - (dd < 0)
                coefs[i] -= sgn
                del0 -= (num - i) * ((sgn * dd) >> denshift)
                if del0 <= 0:
                    break
        elif sgn_del < 0:
            for i in range(num - 1, -1, -1):
                dd = top - out[j - 1 - i]
                sgn = (dd > 0) - (dd < 0)
                coefs[i] += sgn
                del0 -= (num - i) * ((-sgn * dd) >> denshift)
                if del0 >= 0:
                    break
    return out, coefs


# --------------------------------------------------------------- frame decode

ID_SCE, ID_CPE, ID_CCE, ID_LFE, ID_DSE, ID_PCE, ID_FIL, ID_END = range(8)


def decode_packet(pkt, cfg, trace=False):
    bits = Bits(pkt)
    ch_total = cfg["channels"]
    frame_len = cfg["frame_length"]
    bit_depth = cfg["bit_depth"]
    out_ch = []
    while True:
        tag = bits.read(3)
        if tag == ID_END:
            break
        if tag in (ID_SCE, ID_LFE, ID_CPE):
            nch = 2 if tag == ID_CPE else 1
            bits.read(4)  # element instance tag
            unused = bits.read(12)
            assert unused == 0, f"unused header = {unused}"
            partial = bits.read(1)
            bytes_shifted = bits.read(2)
            assert bytes_shifted != 3
            shift = bytes_shifted * 8
            escape = bits.read(1)
            num_samples = bits.read(32) if partial else frame_len
            chanbits = bit_depth - shift + (nch - 1)
            if not escape:
                # mixBits/mixRes are present for SCE too (zero there)
                mix_bits = bits.read(8)
                mix_res = sign_extend(bits.read(8), 8)
                if nch == 1:
                    assert mix_bits == 0 and mix_res == 0
                mode = [0] * nch
                denshift = [0] * nch
                pbf = [0] * nch
                coefs = [None] * nch
                for c in range(nch):
                    hb = bits.read(8)
                    mode[c] = hb >> 4
                    denshift[c] = hb & 0xF
                    hb = bits.read(8)
                    pbf[c] = hb >> 5
                    num = hb & 0x1F
                    coefs[c] = [sign_extend(bits.read(16), 16)
                                for _ in range(num)]
                if trace:
                    print(f"tag={tag} ns={num_samples} chanbits={chanbits} "
                          f"mix={mix_bits}/{mix_res} mode={mode} "
                          f"den={denshift} pbf={pbf} "
                          f"nc={[len(c) for c in coefs]} coefs={coefs}")
                shift_save_pos = None
                if bytes_shifted:
                    shift_save_pos = bits.pos
                    bits.pos += num_samples * shift * nch
                chans = []
                for c in range(nch):
                    pb_local = (cfg["pb"] * pbf[c]) // 4
                    wb = (1 << cfg["kb"]) - 1
                    res = dyn_decomp(bits, num_samples, chanbits,
                                     cfg["mb"], pb_local, cfg["kb"], wb,
                                     cfg["max_run"], trace=trace)
                    if mode[c] == 0:
                        dec, _ = unpc_block(res, num_samples, coefs[c],
                                            denshift[c], chanbits)
                    else:
                        # mode > 0: run an order-31 pass first
                        t, _ = unpc_block(res, num_samples, [0] * 31, 0,
                                          chanbits)
                        dec, _ = unpc_block(t, num_samples, coefs[c],
                                            denshift[c], chanbits)
                    chans.append(dec)
            else:
                # verbatim
                chanbits = bit_depth - shift  # no +1 for escape
                chans = []
                for c in range(nch):
                    pass
                # escape stores samples interleaved
                chans = [[0] * num_samples for _ in range(nch)]
                for j in range(num_samples):
                    for c in range(nch):
                        chans[c][j] = sign_extend(bits.read(chanbits),
                                                  chanbits)
                mix_bits = mix_res = 0
                shift_save_pos = None
                bytes_shifted = 0
            # un-mix / shift re-insertion
            if nch == 2:
                u, v = chans
                if mix_res != 0:
                    left = [0] * num_samples
                    right = [0] * num_samples
                    for j in range(num_samples):
                        l = u[j] + v[j] - ((mix_res * v[j]) >> mix_bits)
                        left[j] = l
                        right[j] = l - v[j]
                    chans = [left, right]
                # else already L/R
            if bytes_shifted:
                sb = Bits(pkt)
                sb.pos = shift_save_pos
                for j in range(num_samples):
                    for c in range(nch):
                        chans[c][j] = (chans[c][j] << shift) | sb.read(shift)
            out_ch.extend(chans)
        elif tag in (ID_DSE, ID_FIL):
            raise NotImplementedError("DSE/FIL")
        else:
            raise NotImplementedError(f"tag {tag}")
    return out_ch, num_samples


def decode_file(path, trace=False):
    cfg, pkts = alac_file(path)
    chans = [[] for _ in range(cfg["channels"])]
    for pkt in pkts:
        out, n = decode_packet(pkt, cfg, trace=trace)
        for c in range(cfg["channels"]):
            chans[c].extend(out[c])
    arr = np.array(chans, dtype=np.int64).T
    return arr[:cfg["n_valid"]], cfg


# ------------------------------------------------------------------- corpus

def main():
    import os

    sys.path.insert(0, os.getcwd())
    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    from test_extra_formats import _sf_write

    rng = np.random.default_rng(0)

    def material(kind, n, ch, grid):
        if kind == "zeros":
            return np.zeros((n, ch), np.float32)
        if kind == "dc":
            return np.full((n, ch), 100 / grid, np.float32)
        if kind == "impulse":
            x = np.zeros((n, ch), np.float32)
            x[10] = 4 / grid
            return x
        if kind == "ramp":
            return (np.arange(n)[:, None] % 256 - 128).astype(np.float32) / grid * np.ones((1, ch), np.float32)
        if kind == "smallnoise":
            return np.round(rng.uniform(-4, 4, (n, ch))).astype(np.float32) / grid
        if kind == "noise":
            return np.round(rng.uniform(-0.3, 0.3, (n, ch)) * grid).astype(np.float32) / grid
        if kind == "loud":
            return np.round(rng.uniform(-0.999, 0.999, (n, ch)) * grid).astype(np.float32) / grid
        if kind == "sine":
            t = np.arange(n) / 44100
            x = 0.5 * np.sin(2 * np.pi * 440 * t)
            return np.round(np.stack([x] * ch, 1) * (grid - 1)).astype(np.float32) / grid
        if kind == "steps":  # constant runs -> long zero-residual spans
            x = (np.repeat(rng.integers(-500, 500, n // 64 + 1), 64)[:n]
                 .astype(np.float32) / grid)
            return np.stack([x] * ch, 1)

    SUBS = {16: 0x0070, 20: 0x0071, 24: 0x0072, 32: 0x0073}
    cases = []
    for kind in ["zeros", "dc", "impulse", "ramp", "smallnoise", "sine",
                 "noise", "loud", "steps"]:
        for ch in (1, 2):
            for n in (400, 5000):
                cases.append((kind, ch, n, 16))
    for kind in ["zeros", "impulse", "smallnoise", "sine", "noise", "loud",
                 "steps"]:
        for bits in (20, 24, 32):
            for ch in (1, 2):
                cases.append((kind, ch, 5000, bits))
    for n in (4095, 4096, 4097, 8192, 12289):  # frame boundaries
        cases.append(("noise", 2, n, 16))
        cases.append(("sine", 1, n, 24))

    fails = 0
    for kind, ch, n, bits in cases:
        grid = 1 << (bits - 1)
        x = material(kind, n, ch, grid)
        path = f"/tmp/alac_{kind}_{ch}_{n}_{bits}.caf"
        _sf_write(path, x, 44100, 0x180000 | SUBS[bits])
        want = np.round(np.asarray(x, np.float64) * grid).astype(np.int64)
        try:
            got, cfg = decode_file(path)
        except Exception as e:
            print(f"FAIL {kind} ch={ch} n={n} bits={bits}: {type(e).__name__}: {e}")
            fails += 1
            continue
        if cfg["bit_depth"] == 32:
            # float write path caps at 24 significant bits through the
            # oracle; compare at the oracle's own decode instead
            from test_extra_formats import _sf_read
            oracle, _ = _sf_read(path)
            want = np.round(np.asarray(oracle, np.float64) * grid).astype(np.int64)
        if got.shape != want.shape:
            print(f"FAIL {kind} ch={ch} n={n} bits={bits}: shape {got.shape} != {want.shape}")
            fails += 1
            continue
        if not np.array_equal(got, want):
            bad = np.argwhere(got != want)
            j, c = bad[0]
            print(f"FAIL {kind} ch={ch} n={n} bits={bits}: {len(bad)} mismatches, "
                  f"first at [{j},{c}]: got {got[j, c]} want {want[j, c]}")
            fails += 1
            continue
        print(f"ok   {kind} ch={ch} n={n} bits={bits}")
    print(f"\n{fails} failures / {len(cases)} cases")


if __name__ == "__main__":
    main()
