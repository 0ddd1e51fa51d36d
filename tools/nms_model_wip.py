# Python port of our own native/g72x_codec.cc G.726 core, with knobs
# for NMS hypothesis testing.
P2 = [1,2,4,8,16,32,64,128,256,512,1024,2048,4096,8192,16384]
def quan(val, table):
    for i,t in enumerate(table):
        if val < t: return i
    return len(table)
def i16(x):
    x &= 0xFFFF
    return x - 0x10000 if x & 0x8000 else x
def fmult(an, srn):
    anmag = an if an > 0 else (-an) & 0x1FFF
    anexp = quan(anmag, P2) - 6
    anmant = 32 if anmag == 0 else (anmag >> anexp if anexp >= 0 else anmag << -anexp)
    wanexp = anexp + ((srn >> 6) & 0xF) - 13
    wanmant = (anmant * (srn & 0x3F)) >> 4
    retval = ((wanmant << wanexp) & 0x7FFF) if wanexp >= 0 else (wanmant >> -wanexp)
    return -retval if (an ^ srn) < 0 else retval
def float_encode(mag, negative):
    if mag == 0: return -0x3E0 if negative else 0x20  # 0xFC20 as int16
    exp = quan(mag, P2)
    v = (exp << 6) + ((mag << 6) >> exp)
    return v - 0x400 if negative else v

DQLN4 = [-2048,4,135,213,273,323,373,425,425,373,323,273,213,135,4,-2048]
WI4   = [-12,18,41,64,112,198,355,1122,1122,355,198,112,64,41,18,-12]
FI4   = [0,0,0,0x200,0x200,0x200,0x600,0xE00,0xE00,0x600,0x200,0x200,0x200,0,0,0]
DQLN3 = [-2048,135,273,373,373,273,135,-2048]
WI3   = [-128,960,4384,18624,18624,4384,960,-128]
FI3   = [0,0x200,0x400,0xE00,0xE00,0x400,0x200,0]
DQLN2 = None  # to be determined for 2-bit
def reconstruct(sign, dqln, y):
    dql = i16(dqln + (y >> 2))
    if dql < 0: return -0x8000 if sign else 0
    dex = (dql >> 7) & 15
    dqt = 128 + (dql & 127)
    dq = (dqt << 7) >> (14 - dex)
    return dq - 0x8000 if sign else dq

class NMS:
    def __init__(self, bits=4, knobs=None):
        self.bits = bits
        self.k = knobs or {}
        self.reset()
    def reset(self):
        self.yl = 34816; self.yu = 544
        self.dms = self.dml = self.ap = 0
        self.a = [0,0]; self.b=[0]*6
        self.pk = [0,0]; self.dq=[32]*6
        self.sr = [32,32]; self.td = 0
    def predictor_zero(self):
        return sum(fmult(self.b[i] >> 2, self.dq[i]) for i in range(6))
    def predictor_pole(self):
        return fmult(self.a[1] >> 2, self.sr[1]) + fmult(self.a[0] >> 2, self.sr[0])
    def step_size(self):
        if self.k.get('no_speed'):   # always-fast hypothesis
            return self.yu
        if self.ap >= 256: return self.yu
        y = self.yl >> 6
        dif = self.yu - y
        al = self.ap >> 2
        if dif > 0: y += (dif * al) >> 6
        elif dif < 0: y += (dif * al + 0x3F) >> 6
        return y
    def update(self, y, wi, fi, dqv, srv, dqsez):
        pk0 = 1 if dqsez < 0 else 0
        mag = dqv & 0x7FFF
        ylint = self.yl >> 15
        ylfrac = (self.yl >> 10) & 0x1F
        thr2 = (31 << 10) if ylint > 9 else ((32 + ylfrac) << ylint)
        dqthr = (thr2 + (thr2 >> 1)) >> 1
        tr = 1 if (self.td != 0 and mag > dqthr and not self.k.get('no_trans')) else 0
        nyu = y + ((wi - y) >> 5)
        nyu = min(max(nyu, 544), 5120)
        self.yu = nyu
        self.yl += nyu + ((-self.yl) >> 6)
        if tr == 1:
            self.a = [0,0]; self.b = [0]*6; a2p = 0
        else:
            pks1 = pk0 ^ self.pk[0]
            a2p = self.a[1] - (self.a[1] >> 7)
            if dqsez != 0:
                fa1 = self.a[0] if pks1 else -self.a[0]
                if fa1 < -8191: a2p -= 0x100
                elif fa1 > 8191: a2p += 0xFF
                else: a2p += fa1 >> 5
                if pk0 ^ self.pk[1]:
                    if a2p <= -12160: a2p = -12288
                    elif a2p >= 12416: a2p = 12288
                    else: a2p -= 0x80
                elif a2p <= -12416: a2p = -12288
                elif a2p >= 12160: a2p = 12288
                else: a2p += 0x80
            self.a[1] = i16(a2p)
            self.a[0] -= self.a[0] >> 8
            if dqsez != 0: self.a[0] += 192 if pks1 == 0 else -192
            a1ul = 15360 - a2p
            self.a[0] = max(-a1ul, min(a1ul, self.a[0]))
            for i in range(6):
                self.b[i] -= self.b[i] >> 8
                if mag: self.b[i] += 128 if (dqv ^ self.dq[i]) >= 0 else -128
        for i in range(5,0,-1): self.dq[i] = self.dq[i-1]
        self.dq[0] = (0x20 if dqv >= 0 else -0x3E0) if mag == 0 else float_encode(mag, dqv < 0)
        self.sr[1] = self.sr[0]
        if srv == 0: self.sr[0] = 0x20
        elif srv > 0: self.sr[0] = float_encode(srv, False)
        elif srv > -32768: self.sr[0] = float_encode(-srv, True)
        else: self.sr[0] = -0x3E0
        self.pk = [pk0, self.pk[0]]
        self.td = 0 if tr == 1 else (1 if a2p < -11776 else 0)
        self.dms += (fi - self.dms) >> 5
        self.dml += ((fi << 2) - self.dml) >> 7
        if tr == 1: self.ap = 256
        elif y < 1536 or self.td or abs((self.dms << 2) - self.dml) >= (self.dml >> 3):
            self.ap += (0x200 - self.ap) >> 4
        else:
            self.ap += (-self.ap) >> 4
    def decode_code(self, code):
        if self.bits == 4: dqln,wi,fi,sb,ws = DQLN4,WI4,FI4,8,5
        elif self.bits == 3: dqln,wi,fi,sb,ws = DQLN3,WI3,FI3,4,0
        else: raise NotImplementedError(f"bits={self.bits} (2-bit tables not recovered)")
        sezi = self.predictor_zero()
        sez = i16(sezi >> 1)
        se = i16((sezi + self.predictor_pole()) >> 1)
        if self.k.get('no_pred'): se = sez = 0
        y = self.step_size()
        dq = reconstruct(code & sb, dqln[code], y)
        sr = i16(se - (dq & 0x3FFF)) if dq < 0 else i16(se + dq)
        dqsez = i16(sr + sez - se)
        self.update(y, wi[code] << ws, fi[code], dq, sr, dqsez)
        return sr
    def pcm(self, sr):
        # NMS: 14-bit sr -> 16-bit PCM, multiple-of-4 grid,
        # ones-complement conversion of negatives (hypothesis).
        if self.k.get('out') == 'g721':
            return i16(sr << 2)
        if sr >= 0:
            return (sr >> 2) << 2
        return (~((-sr) >> 2)) << 2  # hmm: need sign-magnitude mag
    def decode_seq(self, codes):
        out = []
        for c in codes:
            sr = self.decode_code(c)
            out.append(self.pcm(sr))
        return out
