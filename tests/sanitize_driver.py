"""Sanitizer driver — exercises the native layer under ASAN/UBSAN/TSAN.

Run as a standalone script (NOT under pytest) with:

  LD_PRELOAD=<libasan.so|libtsan.so>
  FOLVE_NATIVE_LIB=native/libfolve_native_{asan,tsan}.so

It deliberately never imports jax: the sanitizer runtime's __cxa_throw
interceptor is incompatible with jaxlib's hermetic C++ (CHECK failure in
asan_interceptors.cpp), and the sanitizers' job here is the repo's own
C++ (flac_codec.cc, fuse_transport.cc), not jaxlib.  The FUSE session is
driven over a socketpair against a stub VFS, multithreaded — the surface
where TSAN earns its keep (SURVEY §5).

Exit code 0 = all scenarios ran; the wrapping pytest checks our output
and the sanitizers' (a report aborts or prints ERROR/WARNING lines).
"""

import errno
import os
import socket
import struct
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ---------------------------------------------------------------- FLAC


def check_flac() -> None:
    from folve_tpu.audio.flac import FlacError, read_flac, write_flac
    import io

    rng = np.random.default_rng(7)
    for bits in (8, 16, 24):
        for frames in (1, 100, 4096, 10000):
            x = rng.uniform(-0.9, 0.9, (frames, 2)).astype(np.float32)
            scale = float(1 << (bits - 1))
            x = np.round(x * scale) / scale
            buf = io.BytesIO()
            write_flac(buf, x, 44100, bits=bits)
            got, info = read_flac(buf.getvalue())
            assert got.shape == (frames, 2), (bits, frames, got.shape)
            assert np.max(np.abs(got - x)) < 1.5 / scale
    # Metadata path.
    buf = io.BytesIO()
    write_flac(buf, np.zeros((64, 2), np.float32), 48000, bits=16,
               metadata={"TITLE": "san", "ARTIST": "itizer"})
    blob = bytearray(buf.getvalue())
    # Fuzz: truncations, garbage, bit flips must never crash the codec.
    for cut in (0, 3, 4, 17, len(blob) // 2, len(blob) - 1):
        try:
            read_flac(bytes(blob[:cut]))
        except Exception:
            pass
    rng2 = np.random.default_rng(13)
    for _ in range(200):
        fuzz = bytearray(blob)
        for _ in range(rng2.integers(1, 8)):
            fuzz[rng2.integers(0, len(fuzz))] ^= 1 << rng2.integers(0, 8)
        try:
            read_flac(bytes(fuzz))
        except Exception:
            pass
    garbage = bytes(rng2.integers(0, 256, 4096, dtype=np.uint8))
    try:
        read_flac(garbage)
    except Exception:
        pass

    # Parallel frame-encode pool under the sanitizer: multi-block writes
    # fan frames across workers; several encoders pound the shared pool
    # from python threads; output must equal the serial encode.
    from folve_tpu.audio.flac import set_encoder_threads

    def enc_bytes(x):
        buf = io.BytesIO()
        write_flac(buf, x, 44100, bits=16)
        return buf.getvalue()

    material = [
        np.round(rng.uniform(-0.8, 0.8, (4096 * 5 + 333, 2)) * 32768).astype(
            np.float32
        )
        / 32768
        for _ in range(4)
    ]
    set_encoder_threads(1)
    refs = [enc_bytes(x) for x in material]
    set_encoder_threads(4)
    got = [None] * len(material)

    def enc_worker(i):
        got[i] = enc_bytes(material[i])

    threads = [
        threading.Thread(target=enc_worker, args=(i,))
        for i in range(len(material))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert got == refs, "parallel encode diverged from serial"

    # Parallel frame DECODE under the sanitizer: multi-frame reads fan
    # across the pool; several decoders on several Python threads; the
    # result must equal the serial decode, for clean AND corrupt input.
    def dec_all(blob):
        got, _ = read_flac(blob)
        return got.tobytes()

    set_encoder_threads(1)
    dec_refs = [dec_all(b) for b in refs]
    set_encoder_threads(4)
    dec_got = [None] * len(refs)

    def dec_worker(i):
        dec_got[i] = dec_all(refs[i])

    threads = [
        threading.Thread(target=dec_worker, args=(i,)) for i in range(len(refs))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert dec_got == dec_refs, "parallel decode diverged from serial"
    rng3 = np.random.default_rng(23)
    for _ in range(60):
        fuzz = bytearray(refs[0])
        for _ in range(rng3.integers(1, 6)):
            fuzz[rng3.integers(0, len(fuzz))] ^= 1 << rng3.integers(0, 8)
        set_encoder_threads(1)
        try:
            a = dec_all(bytes(fuzz))
        except Exception:
            a = None
        set_encoder_threads(4)
        try:
            b = dec_all(bytes(fuzz))
        except Exception:
            b = None
        assert a == b, "corrupt-stream decode diverged serial vs parallel"
    set_encoder_threads(0)
    print("flac: ok")


# ------------------------------------------------------------ FUSE/VFS

FUSE_LOOKUP = 1
FUSE_GETATTR = 3
FUSE_OPEN = 14
FUSE_READ = 15
FUSE_RELEASE = 18
FUSE_INIT = 26
FUSE_OPENDIR = 27
FUSE_READDIR = 28
FUSE_RELEASEDIR = 29
FUSE_DESTROY = 38
ROOT_ID = 1
IN_HDR = struct.Struct("<IIQQIIII")
OUT_HDR = struct.Struct("<IiQ")


class StubStat:
    st_size = 1 << 16
    st_mode = 0o100444
    st_mtime = 0.0
    st_atime = 0.0
    st_ctime = 0.0
    st_nlink = 1
    st_uid = 0
    st_gid = 0


class StubVfs:
    """Minimal VFS: a handful of readable pseudo-files (no jax)."""

    def getattr(self, path, handler=None):
        if path == "/" :
            st = StubStat()
            st.st_mode = 0o40555
            return st
        if not path.startswith("/f"):
            raise OSError(errno.ENOENT, path)
        return StubStat()

    def readdir(self, path):
        return [".", "..", *(f"f{i}" for i in range(16))]

    def readlink(self, path):
        raise OSError(errno.EINVAL, path)

    def open(self, path):
        if not path.startswith("/f"):
            raise OSError(errno.ENOENT, path)
        return path

    def read(self, handler, size, offset):
        blob = (handler * 997).encode()
        return blob[offset : offset + size]

    def release(self, path, handler):
        pass


class Kernel:
    """Socketpair 'kernel' firing concurrent requests at the session."""

    def __init__(self):
        from folve_tpu.fuse.mount import FuseSession

        self.sock, session_sock = socket.socketpair(
            socket.AF_UNIX, socket.SOCK_SEQPACKET
        )
        self.session = FuseSession(StubVfs())
        self._session_sock = session_sock
        self.session.set_fd(session_sock.fileno())
        self._unique = 0
        self._lock = threading.Lock()
        self._pending = {}
        self._cv = threading.Condition(self._lock)
        self.thread = threading.Thread(
            target=self.session.loop, kwargs=dict(num_threads=4), daemon=True
        )
        self.thread.start()
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()

    def _read_loop(self):
        while True:
            try:
                reply = self.sock.recv(1 << 20)
            except OSError:
                return
            if not reply:
                return
            _, _, unique = OUT_HDR.unpack_from(reply)
            with self._cv:
                self._pending[unique] = reply
                self._cv.notify_all()

    def request(self, opcode, nodeid, payload=b"", want_reply=True):
        with self._lock:
            self._unique += 1
            unique = self._unique
        msg = IN_HDR.pack(
            IN_HDR.size + len(payload), opcode, unique, nodeid, 0, 0, 0, 0
        ) + payload
        self.sock.send(msg)
        if not want_reply:
            return None, None
        with self._cv:
            while unique not in self._pending:
                if not self._cv.wait(timeout=30):
                    raise TimeoutError(f"no reply for {unique}")
            reply = self._pending.pop(unique)
        length, error, _ = OUT_HDR.unpack_from(reply)
        return error, reply[OUT_HDR.size : length]

    def init(self):
        payload = struct.pack("<IIII", 7, 38, 65536, 0) + bytes(48)
        err, _ = self.request(FUSE_INIT, 0, payload)
        assert err == 0


def check_fuse() -> None:
    k = Kernel()
    k.init()

    def lookup(name):
        payload = name.encode() + b"\0"
        err, body = k.request(FUSE_LOOKUP, ROOT_ID, payload)
        assert err == 0, (name, err)
        nodeid = struct.unpack_from("<Q", body)[0]
        return nodeid

    errors = []

    def worker(i):
        try:
            for round_ in range(20):
                nodeid = lookup(f"f{i % 16}")
                err, body = k.request(
                    FUSE_OPEN, nodeid, struct.pack("<II", os.O_RDONLY, 0)
                )
                assert err == 0
                fh = struct.unpack_from("<Q", body)[0]
                err, data = k.request(
                    FUSE_READ, nodeid,
                    struct.pack("<QQIIQII", fh, (i * 7) % 512, 4096, 0, 0, 0, 0),
                )
                assert err == 0 and data
                err2, _ = k.request(
                    FUSE_RELEASE, nodeid, struct.pack("<QIIQ", fh, 0, 0, 0)
                )
                assert err2 == 0
                # Unknown names produce ENOENT without crashing.
                err3, _ = k.request(FUSE_LOOKUP, ROOT_ID, b"nosuch\0")
                assert err3 == -errno.ENOENT
                # Concurrent readdir.
                err4, body4 = k.request(
                    FUSE_OPENDIR, ROOT_ID, struct.pack("<II", 0, 0)
                )
                assert err4 == 0
                dfh = struct.unpack_from("<Q", body4)[0]
                k.request(
                    FUSE_READDIR, ROOT_ID,
                    struct.pack("<QQIIQII", dfh, 0, 8192, 0, 0, 0, 0),
                )
                k.request(
                    FUSE_RELEASEDIR, ROOT_ID,
                    struct.pack("<QIIQ", dfh, 0, 0, 0),
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    # Orderly teardown: wait for the DESTROY reply (guarantees the
    # session's exiting flag is set), then shutdown() the kernel-side
    # socket — that wakes every blocked read/recv with EOF without the
    # close-vs-blocked-recv race TSAN would (rightly) flag in CPython's
    # _socket.  Only after all threads joined are the fds closed.
    err, _ = k.request(FUSE_DESTROY, 0)
    assert err == 0
    k.sock.shutdown(socket.SHUT_RDWR)
    k.thread.join(timeout=30)
    assert not k.thread.is_alive(), "session loop did not exit"
    k._reader.join(timeout=30)
    assert not k._reader.is_alive(), "reader did not exit"
    k.sock.close()
    k._session_sock.close()
    print("fuse: ok")


def check_vorbis() -> None:
    """From-scratch Vorbis decoder under the sanitizer: decode a real
    third-party-encoded file, then fuzz it (bitflips + truncations)."""
    import glob

    from folve_tpu.audio.ogg import read_ogg

    samples = glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame/examples/data/*.ogg"
    )
    if not samples:
        print("vorbis: skipped (no sample)")
        return
    blob = bytearray(open(samples[0], "rb").read())
    # Parallel packet decode under the sanitizer: whole-file and from
    # two Python threads at once; must equal the SERIAL result (force
    # width 1 for the reference — ambient auto could itself be parallel).
    from folve_tpu.audio.flac import set_encoder_threads

    set_encoder_threads(1)
    data, info = read_ogg(samples[0])
    assert data.shape[0] == info.frames and info.frames > 0

    set_encoder_threads(4)
    par = [None, None]

    def vdec(i):
        par[i] = read_ogg(samples[0])[0].tobytes()

    vts = [threading.Thread(target=vdec, args=(i,)) for i in range(2)]
    for t in vts:
        t.start()
    for t in vts:
        t.join()
    assert par[0] == par[1] == data.tobytes(), "parallel vorbis diverged"
    set_encoder_threads(0)

    rng = np.random.default_rng(23)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "f.ogg")
        for _ in range(80):
            fuzz = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                fuzz[int(rng.integers(0, len(fuzz)))] ^= 1 << int(
                    rng.integers(0, 8)
                )
            with open(p, "wb") as f:
                f.write(bytes(fuzz))
            try:
                read_ogg(p)
            except Exception:
                pass
        for cut in (0, 5, 100, len(blob) // 2, len(blob) - 1):
            with open(p, "wb") as f:
                f.write(bytes(blob[:cut]))
            try:
                read_ogg(p)
            except Exception:
                pass
    print("vorbis: ok")


def check_dwvw() -> None:
    """DWVW codec: round-trip at every depth, chunked-reservoir decode,
    truncation short-stop, and garbage-bitstream fuzz (the decoder must
    never read past its reservoir whatever the widths do)."""
    import ctypes

    from folve_tpu.audio.dwvw import _lib, decode_dwvw, encode_dwvw

    rng = np.random.default_rng(11)
    for bits in (12, 16, 24):
        lim = (1 << (bits - 1)) - 1
        vals = np.round(rng.uniform(-1, 1, 5000) * lim).astype(np.int32)
        vals[7] = -lim - 1  # most-negative escape
        payload = encode_dwvw(vals, bits)
        dec = decode_dwvw(payload, bits, max_frames=5000)
        got = np.round(dec[:, 0] * (1 << (bits - 1))).astype(np.int32)
        assert np.array_equal(got, vals), f"dwvw {bits} roundtrip"
        # chunked feeding through the reservoir, odd sizes
        lib = _lib()
        h = lib.folve_dwvw_create(bits)
        out = np.empty(len(payload) * 8 + 64, np.int32)
        n = 0
        for i in range(0, len(payload), 13):
            chunk = payload[i : i + 13]
            n += lib.folve_dwvw_decode(
                h, chunk, len(chunk),
                out[n:].ctypes.data_as(ctypes.c_void_p), out.size - n)
        lib.folve_dwvw_close(h)
        assert np.array_equal(out[:5000], vals), f"dwvw {bits} chunked"
        # truncations
        for cut in (1, 7, len(payload) // 2, len(payload) - 1):
            decode_dwvw(payload[:cut], bits, max_frames=5000)
        # garbage
        for _ in range(50):
            blob = rng.integers(0, 256, rng.integers(1, 400),
                                dtype=np.uint8).tobytes()
            decode_dwvw(blob, bits, max_frames=10000)
    print("dwvw: ok")


def check_nms() -> None:
    """NMS VBX ADPCM under the sanitizers: encode/decode round-trip at
    every rate, chunked decode through the streaming entry point,
    truncation (stale-word tail path), and garbage fuzz."""
    import ctypes

    from folve_tpu.audio.nms import (BLOCK_BYTES, _lib, decode_nms,
                                     encode_nms, nms_frames_in)

    rng = np.random.default_rng(13)
    for rate_type in (0, 1, 2):
        x = np.round(rng.uniform(-1, 1, 160 * 12) * 30000).astype(np.int16)
        x[100:300] = 0
        payload = encode_nms(x, rate_type)
        assert len(payload) == 12 * BLOCK_BYTES[rate_type]
        dec = decode_nms(payload, rate_type)
        assert dec.shape == (160 * 12, 1) and np.all(np.isfinite(dec))
        # chunked decode with persistent state matches one-shot
        lib = _lib()
        h = lib.folve_nms_create(rate_type)
        out = np.zeros(160 * 12, np.int16)
        n = 0
        bb = BLOCK_BYTES[rate_type]
        for i in range(0, len(payload), bb * 5):
            chunk = payload[i : i + bb * 5]
            n += lib.folve_nms_decode(
                h, chunk, len(chunk),
                out[n:].ctypes.data_as(ctypes.c_void_p))
        lib.folve_nms_close(h)
        whole = np.round(dec[:, 0] * 32768).astype(np.int16)
        assert np.array_equal(out[:n], whole), f"nms {rate_type} chunked"
        # truncations (partial final block decodes against stale words)
        for cut in (1, bb - 1, bb + 3, len(payload) - 7):
            got = decode_nms(payload[:cut], rate_type)
            assert got.shape[0] == nms_frames_in(cut, rate_type)
        # garbage
        for _ in range(50):
            blob = rng.integers(0, 256, rng.integers(0, 6 * bb),
                                dtype=np.uint8).tobytes()
            decode_nms(blob, rate_type)
    print("nms: ok")


def _bind_celt(lib) -> None:
    import ctypes

    if hasattr(lib.folve_celt_create, "_celt_ready"):
        return
    lib.folve_celt_create.restype = ctypes.c_void_p
    lib.folve_celt_create.argtypes = [ctypes.c_int]
    lib.folve_celt_reset.argtypes = [ctypes.c_void_p]
    lib.folve_celt_close.argtypes = [ctypes.c_void_p]
    lib.folve_celt_probe.restype = ctypes.c_int
    lib.folve_celt_probe.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.folve_celt_decode.restype = ctypes.c_int
    lib.folve_celt_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p]
    lib.folve_celt_final_range.restype = ctypes.c_uint32
    lib.folve_celt_final_range.argtypes = [ctypes.c_void_p]
    lib.folve_celt_create._celt_ready = True


def check_opus_packet_layer() -> None:
    """The full Opus packet layer (SILK + hybrid + CELT dispatch,
    redundancy frames, mode switching) under the sanitizers: real
    speech-mode packets from the libopus encoder, truncations, bit
    flips and garbage — the shared-range-coder paths and the SILK
    fixed-point synthesis must stay in bounds for any bitstream."""
    import ctypes
    import glob

    cands = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/libopus*.so*"))
    if not cands:
        print("opus: skipped (no libopus)")
        return
    ol = ctypes.CDLL(cands[0])
    ol.opus_encoder_create.restype = ctypes.c_void_p
    ol.opus_encode_float.restype = ctypes.c_int

    from folve_tpu.audio.opus import _lib

    lib = _lib()
    rng = np.random.default_rng(23)
    # (mode, bandwidth, frame, bitrate): SILK WB w/ FEC, hybrid FB,
    # 60 ms NB SILK, plus mode switching below.
    cases = [(1000, 1103, 960, 18000, 20), (1001, 1105, 960, 48000, 0),
             (1000, 1101, 2880, 12000, 0)]
    for ch in (1, 2):
        for mode, bw, frame, rate, fec in cases:
            err = ctypes.c_int()
            enc = ol.opus_encoder_create(48000, ch, 2048, ctypes.byref(err))
            ol.opus_encoder_ctl(ctypes.c_void_p(enc), 11002, mode)
            ol.opus_encoder_ctl(ctypes.c_void_p(enc), 4008, bw)
            ol.opus_encoder_ctl(ctypes.c_void_p(enc), 4002, rate)
            if fec:
                ol.opus_encoder_ctl(ctypes.c_void_p(enc), 4012, 1)
                ol.opus_encoder_ctl(ctypes.c_void_p(enc), 4014, fec)
            dec = lib.folve_opus_create(ch)
            sig = np.clip(0.5 * rng.standard_normal((frame * 6, ch)),
                          -1, 1).astype(np.float32)
            for i in range(6):
                buf = ctypes.create_string_buffer(4000)
                x = np.ascontiguousarray(sig[i * frame:(i + 1) * frame])
                ln = ol.opus_encode_float(
                    ctypes.c_void_p(enc), x.ctypes.data_as(ctypes.c_void_p),
                    frame, buf, 4000)
                pkt = buf.raw[:ln]
                out = np.zeros((frame, ch), np.float32)
                r = lib.folve_opus_decode(
                    dec, pkt, ln, out.ctypes.data_as(ctypes.c_void_p))
                assert r == frame and np.all(np.isfinite(out))
                for cut in (1, ln // 2, ln - 1):
                    n = lib.folve_opus_probe(pkt[:cut], cut)
                    if n > 0:
                        o2 = np.zeros((n, ch), np.float32)
                        lib.folve_opus_decode(
                            dec, pkt[:cut], cut,
                            o2.ctypes.data_as(ctypes.c_void_p))
                fz = bytearray(pkt)
                for _ in range(6):
                    fz[rng.integers(0, len(fz))] = rng.integers(0, 256)
                n = lib.folve_opus_probe(bytes(fz), len(fz))
                if n > 0:
                    o2 = np.zeros((n, ch), np.float32)
                    lib.folve_opus_decode(dec, bytes(fz), len(fz),
                                          o2.ctypes.data_as(ctypes.c_void_p))
            lib.folve_opus_close(dec)
            ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    # pure garbage against a long-lived decoder (state carries over)
    dec = lib.folve_opus_create(2)
    for _ in range(150):
        blob = bytes(rng.integers(0, 256, rng.integers(1, 600),
                                  dtype=np.uint8))
        n = lib.folve_opus_probe(blob, len(blob))
        if n > 0:
            out = np.zeros((n, 2), np.float32)
            lib.folve_opus_decode(dec, blob, len(blob),
                                  out.ctypes.data_as(ctypes.c_void_p))
    lib.folve_opus_close(dec)
    print("opus: ok")


def check_celt() -> None:
    """Opus CELT decoder under the sanitizers: real packets at several
    rates/frame sizes (libopus encoder as fixture generator), truncated
    packets, and garbage fuzz — the PVQ/allocation/folding paths must
    stay in bounds whatever the bitstream does."""
    import ctypes
    import glob

    cands = sorted(glob.glob(
        "/opt/venv/lib/python3*/site-packages/pygame.libs/libopus*.so*"))
    if not cands:
        print("celt: skipped (no libopus)")
        return
    ol = ctypes.CDLL(cands[0])
    ol.opus_encoder_create.restype = ctypes.c_void_p
    ol.opus_encode_float.restype = ctypes.c_int

    from folve_tpu.audio.opus import _lib

    lib = _lib()
    _bind_celt(lib)
    rng = np.random.default_rng(17)
    for ch in (1, 2):
        for frame, rate in ((120, 96000), (240, 6000), (960, 64000)):
            err = ctypes.c_int()
            enc = ol.opus_encoder_create(48000, ch, 2049, ctypes.byref(err))
            ol.opus_encoder_ctl(ctypes.c_void_p(enc), 11002, 1002)
            ol.opus_encoder_ctl(ctypes.c_void_p(enc), 4002, rate)
            dec = lib.folve_celt_create(ch)
            sig = np.clip(0.5 * rng.standard_normal((frame * 8, ch)),
                          -1, 1).astype(np.float32)
            for i in range(8):
                buf = ctypes.create_string_buffer(4000)
                x = np.ascontiguousarray(sig[i * frame:(i + 1) * frame])
                ln = ol.opus_encode_float(
                    ctypes.c_void_p(enc), x.ctypes.data_as(ctypes.c_void_p),
                    frame, buf, 4000)
                pkt = buf.raw[:ln]
                out = np.zeros((frame, ch), np.float32)
                r = lib.folve_celt_decode(
                    dec, pkt, ln, out.ctypes.data_as(ctypes.c_void_p))
                assert r == frame and np.all(np.isfinite(out))
                # truncations + bit flips of a real packet
                for cut in (1, ln // 2, ln - 1):
                    n = lib.folve_celt_probe(pkt[:cut], cut)
                    if n > 0:
                        o2 = np.zeros((n, ch), np.float32)
                        lib.folve_celt_decode(
                            dec, pkt[:cut], cut,
                            o2.ctypes.data_as(ctypes.c_void_p))
                fz = bytearray(pkt)
                for _ in range(6):
                    fz[rng.integers(0, len(fz))] = rng.integers(0, 256)
                n = lib.folve_celt_probe(bytes(fz), len(fz))
                if n > 0:
                    o2 = np.zeros((n, ch), np.float32)
                    lib.folve_celt_decode(dec, bytes(fz), len(fz),
                                          o2.ctypes.data_as(ctypes.c_void_p))
            lib.folve_celt_close(dec)
            ol.opus_encoder_destroy(ctypes.c_void_p(enc))
    # pure garbage
    dec = lib.folve_celt_create(2)
    for _ in range(100):
        blob = bytes(rng.integers(0, 256, rng.integers(1, 600),
                                  dtype=np.uint8))
        n = lib.folve_celt_probe(blob, len(blob))
        if n > 0:
            out = np.zeros((n, 2), np.float32)
            lib.folve_celt_decode(dec, blob, len(blob),
                                  out.ctypes.data_as(ctypes.c_void_p))
    lib.folve_celt_close(dec)
    print("celt: ok")


def check_mp3() -> None:
    """MP3 decoder under the sanitizers: a real lame-encoded stream
    (exercises Huffman LUT + fallback, IMDCT/DCT paths), truncations at
    every alignment class, and garbage fuzz."""
    try:
        from folve_tpu.tools.mp3_oracle import lame_available, lame_encode
        if not lame_available():
            print("mp3: skipped (no lame)")
            return
    except Exception:
        print("mp3: skipped (no lame)")
        return
    from folve_tpu.audio.mp3 import read_mp3

    rng = np.random.default_rng(5)
    t = np.arange(44100 * 2) / 44100.0
    x = (0.4 * np.sin(2 * np.pi * 440 * t)[:, None] * [1.0, 0.8]
         + 0.05 * rng.standard_normal((t.size, 2))).astype(np.float32)
    blob = lame_encode(x, 44100, 192)
    got, info = read_mp3(blob)
    assert got.shape[0] > 80000 and info.channels == 2
    for cut in (1, 417, len(blob) // 2, len(blob) - 3):
        try:
            read_mp3(blob[:cut])
        except Exception:
            pass
    for _ in range(30):
        fuzz = bytearray(blob[: 4096])
        for _ in range(12):
            fuzz[rng.integers(0, len(fuzz))] = rng.integers(0, 256)
        try:
            read_mp3(bytes(fuzz))
        except Exception:
            pass
    print("mp3: ok")


if __name__ == "__main__":
    check_flac()
    check_vorbis()
    check_dwvw()
    check_nms()
    check_celt()
    check_opus_packet_layer()
    check_mp3()
    check_fuse()
    print("SANITIZE_DRIVER_OK")
