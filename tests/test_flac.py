"""FLAC codec tests.

No third-party FLAC tool exists in this environment, so validation is:
(1) encoder->decoder round-trips must be bit-exact,
(2) STREAMINFO MD5 (computed by the C++ encoder) must equal hashlib's MD5
    of the decoded samples — an independent implementation check,
(3) a hand-assembled known-good byte vector decodes correctly,
(4) structural checks (magic, STREAMINFO fields, frame CRCs implicitly
    verified by the decoder).
"""

import hashlib
import os
import struct

import numpy as np
import pytest

from folve_tpu.audio.flac import (
    FlacDecoder,
    FlacEncoder,
    FlacError,
    read_flac,
    read_flac_info,
    write_flac,
)


def encode_to_bytes(samples_int, rate, bits=16, blocksize=4096, patch=True):
    enc = FlacEncoder(rate, samples_int.shape[1], bits, blocksize)
    blob = bytearray(enc.header())
    blob += enc.write_int(samples_int)
    blob += enc.finish()
    if patch:
        si = enc.streaminfo(with_md5=True)
        off = FlacEncoder.STREAMINFO_FILE_OFFSET
        blob[off : off + len(si)] = si
    enc.close()
    return bytes(blob)


@pytest.mark.parametrize("bits", [8, 16, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_noise(rng, bits, channels):
    lim = 1 << (bits - 1)
    x = rng.integers(-lim, lim, size=(10000, channels), dtype=np.int64).astype(np.int32)
    blob = encode_to_bytes(x, 44100, bits=bits)
    dec = FlacDecoder(blob)
    assert dec.info.rate == 44100
    assert dec.info.channels == channels
    assert dec.info.bits_per_sample == bits
    assert dec.info.frames == 10000
    got = dec.read_int(20000)
    np.testing.assert_array_equal(got, x)


def test_roundtrip_tonal_stereo(rng):
    """Correlated stereo content exercises L/S, R/S, M/S decisions."""
    t = np.arange(48000)
    left = (12000 * np.sin(2 * np.pi * 440 * t / 48000)).astype(np.int32)
    right = (left * 0.8 + 500 * rng.standard_normal(len(t))).astype(np.int32)
    x = np.stack([left, right], axis=1)
    blob = encode_to_bytes(x, 48000)
    got, info = read_flac(blob)
    np.testing.assert_array_equal(
        np.round(got * 32768).astype(np.int32), x
    )
    # Tonal content should compress well below raw size.
    assert len(blob) < x.nbytes * 0.9


def test_md5_matches_hashlib(rng):
    """C++ MD5 vs Python hashlib over the same sample stream."""
    x = rng.integers(-30000, 30000, size=(12345, 2), dtype=np.int64).astype(np.int32)
    blob = encode_to_bytes(x, 44100)
    md5_header = blob[8 + 18 : 8 + 34]
    raw = x.astype("<i2").tobytes()  # 16-bit little-endian interleaved
    assert md5_header == hashlib.md5(raw).digest()
    # And the decoder returns exactly those samples.
    got, _ = read_flac(blob)
    assert hashlib.md5(np.round(got * 32768).astype("<i2").tobytes()).digest() == md5_header


def test_serving_mode_md5_off_same_frames(rng):
    """md5=False (the FUSE serving mode) must emit byte-identical audio
    frames — only the STREAMINFO digest field may differ (zeros)."""
    from folve_tpu.audio.flac import FlacEncoder

    x = rng.integers(-30000, 30000, size=(12345, 2), dtype=np.int64).astype(np.int32)

    def run(md5):
        enc = FlacEncoder(44100, 2, bits=16, total_frames_hint=len(x), md5=md5)
        blob = enc.header() + enc.write_int(x) + enc.finish()
        si = enc.streaminfo(with_md5=True)
        enc.close()
        return blob, si

    blob_on, si_on = run(True)
    blob_off, si_off = run(False)
    assert blob_on == blob_off  # headers both carry zero MD5 pre-patch
    assert si_on[18:34] != b"\x00" * 16
    assert si_off[18:34] == b"\x00" * 16  # digest honestly absent
    assert si_on[:18] == si_off[:18]
    got, _ = read_flac(blob_off)
    np.testing.assert_array_equal(np.round(got * 32768).astype(np.int32), x)


def test_constant_and_silence():
    x = np.zeros((9000, 2), dtype=np.int32)
    x[4096:8192] = 777
    blob = encode_to_bytes(x, 44100)
    got, info = read_flac(blob)
    np.testing.assert_array_equal(np.round(got * 32768).astype(np.int32), x)
    # Constant blocks should be tiny.
    assert len(blob) < 2500


def test_partial_final_block(rng):
    x = rng.integers(-1000, 1000, size=(5000, 1), dtype=np.int64).astype(np.int32)
    blob = encode_to_bytes(x, 44100, blocksize=4096)
    got, info = read_flac(blob)
    assert info.frames == 5000
    np.testing.assert_array_equal(np.round(got * 32768).astype(np.int32), x)


def test_streaming_decode_chunks(rng):
    x = rng.integers(-20000, 20000, size=(30000, 2), dtype=np.int64).astype(np.int32)
    blob = encode_to_bytes(x, 44100)
    dec = FlacDecoder(blob)
    pieces = []
    while True:
        chunk = dec.read_int(777)
        if not len(chunk):
            break
        pieces.append(chunk)
    got = np.concatenate(pieces)
    np.testing.assert_array_equal(got, x)
    dec.rewind()
    again = dec.read_int(30000)
    np.testing.assert_array_equal(again, x)


def test_streaming_encode_matches_batch(rng):
    x = rng.integers(-20000, 20000, size=(10000, 2), dtype=np.int64).astype(np.int32)
    whole = encode_to_bytes(x, 44100, patch=False)
    enc = FlacEncoder(44100, 2, 16, 4096)
    blob = bytearray(enc.header())
    for start in range(0, 10000, 713):
        blob += enc.write_int(x[start : start + 713])
    blob += enc.finish()
    enc.close()
    assert bytes(blob) == whole


def test_unknown_length_streaming_header(rng):
    """Streaming use: header written before the sample count is known,
    patched afterwards (the reference's WriteCharAt path,
    convolve-file-handler.cc:307-317)."""
    x = rng.integers(-100, 100, size=(3000, 2), dtype=np.int64).astype(np.int32)
    enc = FlacEncoder(44100, 2, 16, 1024, total_frames_hint=0)
    blob = bytearray(enc.header())
    blob += enc.write_int(x)
    blob += enc.finish()
    si = enc.streaminfo(with_md5=True)
    off = FlacEncoder.STREAMINFO_FILE_OFFSET
    blob[off : off + len(si)] = si
    got, info = read_flac(bytes(blob))
    assert info.frames == 3000
    np.testing.assert_array_equal(np.round(got * 32768).astype(np.int32), x)


def test_rejects_garbage():
    with pytest.raises(FlacError):
        FlacDecoder(b"definitely not flac data....")


def test_handcrafted_vector():
    """A minimal FLAC stream assembled bit-by-bit from the spec:
    one frame, 16 samples, mono 8-bit, verbatim subframe."""
    samples = list(range(-8, 8))
    # STREAMINFO
    si = bytearray()
    si += struct.pack(">HH", 16, 16)  # min/max blocksize
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    # rate 44100 (20 bits), channels-1=0 (3), bits-1=7 (5), total=16 (36)
    tail = (44100 << 44) | (0 << 41) | (7 << 36) | 16
    si += tail.to_bytes(8, "big")
    si += bytes(16)  # md5 zero (decoder does not enforce)
    header = b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(si)
    # Frame header: sync(14)=0x3FFE, res(1)=0, fixed(1)=0 -> bytes FF F8
    fh = bytearray([0xFF, 0xF8])
    fh.append((0x06 << 4) | 0x09)  # blocksize code 6 (8-bit n-1), rate code 9 (44100)
    fh.append((0x00 << 4) | (0x01 << 1))  # ch code 0 (mono), size code 1 (8-bit)
    fh.append(0x00)  # coded frame number 0
    fh.append(15)  # blocksize-1 = 15
    crc8 = _crc8(bytes(fh))
    fh.append(crc8)
    # Subframe: pad(1)=0 type(6)=1 VERBATIM wasted(1)=0 -> byte 0b0000_0010
    body = bytearray([0x02])
    for s in samples:
        body.append(s & 0xFF)
    frame = bytes(fh) + bytes(body)
    crc16 = _crc16(frame)
    frame += struct.pack(">H", crc16)
    blob = header + frame
    got, info = read_flac(blob)
    assert info.rate == 44100 and info.channels == 1 and info.bits_per_sample == 8
    np.testing.assert_array_equal(
        np.round(got[:, 0] * 128).astype(int), np.array(samples)
    )


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def test_write_flac_file(tmp_path, rng):
    x = rng.uniform(-0.5, 0.5, (20000, 2)).astype(np.float32)
    p = str(tmp_path / "t.flac")
    write_flac(p, x, 44100, bits=24)
    got, info = read_flac(p)
    assert info.bits_per_sample == 24
    np.testing.assert_allclose(got, x, atol=1.5 / (1 << 23))


class TestParallelEncode:
    """The frame worker pool must be a pure speedup: byte-identical
    output at any thread count (frames are independent; counters fold
    in frame order).  This box has 1 CPU, so these prove correctness;
    the throughput win shows on real hosts."""

    @pytest.fixture(autouse=True)
    def _restore_threads(self):
        from folve_tpu.audio.flac import set_encoder_threads

        yield
        set_encoder_threads(0)

    def _material(self, rng):
        n = 4096 * 7 + 913  # 8 blocks incl. odd final
        tone = np.round(
            20000 * np.sin(np.arange(n) * 0.03)[:, None] * [1.0, 0.7]
        ).astype(np.int32)
        noise = rng.integers(-30000, 30000, (n, 2), dtype=np.int64).astype(np.int32)
        mixed = tone.copy()
        mixed[1000:3000] = 0  # constant runs
        mixed[n // 2 :] += noise[n // 2 :] // 8
        return [tone, noise, mixed]

    def test_bit_identical_to_serial(self, rng):
        from folve_tpu.audio.flac import set_encoder_threads

        for x in self._material(rng):
            set_encoder_threads(1)
            serial = encode_to_bytes(x, 44100)
            set_encoder_threads(4)
            parallel = encode_to_bytes(x, 44100)
            assert serial == parallel

    def test_bit_identical_across_split_writes(self, rng):
        """Multi-call writes with carry blocks: pool engages on the
        bulk middle writes, carry completion frames stay in order."""
        from folve_tpu.audio.flac import FlacEncoder, set_encoder_threads

        x = self._material(rng)[2]
        set_encoder_threads(1)
        ref = encode_to_bytes(x, 44100)

        set_encoder_threads(4)
        enc = FlacEncoder(44100, 2, 16, 4096)
        blob = bytearray(enc.header())
        cuts = [0, 700, 700 + 4096 * 3 + 11, 700 + 4096 * 5, x.shape[0]]
        for a, b in zip(cuts, cuts[1:]):
            blob += enc.write_int(x[a:b])
        blob += enc.finish()
        si = enc.streaminfo(with_md5=True)
        off = FlacEncoder.STREAMINFO_FILE_OFFSET
        blob[off : off + len(si)] = si
        enc.close()
        assert bytes(blob) == ref

    def test_concurrent_encoders_share_the_pool(self, rng):
        """Several encoder objects on several Python threads all routing
        through one process-wide pool."""
        import threading

        from folve_tpu.audio.flac import set_encoder_threads

        material = self._material(rng)
        set_encoder_threads(1)
        refs = [encode_to_bytes(x, 44100) for x in material]
        set_encoder_threads(3)
        got = [None] * len(material)

        def work(i):
            got[i] = encode_to_bytes(material[i], 44100)

        threads = [
            threading.Thread(target=work, args=(i,)) for i in range(len(material))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert got == refs

    def test_shrunk_thread_cap_limits_batch_width(self, rng):
        """After SetThreads shrinks the pool, surplus workers from an
        earlier larger configuration must sit out the batch — the
        effective encode width really drops."""
        from folve_tpu.audio.flac import last_parallel_width, set_encoder_threads

        x = np.repeat(self._material(rng)[1], 8, axis=0)  # ~57 frames
        set_encoder_threads(8)
        wide = encode_to_bytes(x, 44100)
        grown = last_parallel_width()
        assert 2 <= grown <= 8
        set_encoder_threads(2)
        narrow = encode_to_bytes(x, 44100)
        assert 1 <= last_parallel_width() <= 2
        assert narrow == wide  # width never changes bytes


class TestFuzz:
    """The native decoder must never crash on corrupt input."""

    def test_random_garbage_after_magic(self, rng):
        for seed in range(20):
            r = np.random.default_rng(seed)
            blob = b"fLaC" + bytes(r.integers(0, 256, 4096, dtype=np.uint8))
            try:
                dec = FlacDecoder(blob)
                dec.read_int(10000)
                dec.close()
            except FlacError:
                pass  # rejecting is fine; crashing is not

    def test_bitflipped_valid_stream(self, rng):
        x = rng.integers(-20000, 20000, size=(20000, 2), dtype=np.int64).astype(np.int32)
        blob = bytearray(encode_to_bytes(x, 44100))
        r = np.random.default_rng(7)
        for _ in range(30):
            corrupt = bytearray(blob)
            for _ in range(10):
                pos = int(r.integers(42, len(corrupt)))
                corrupt[pos] ^= 1 << int(r.integers(0, 8))
            try:
                dec = FlacDecoder(bytes(corrupt))
                out = dec.read_int(30000)
                assert out.shape[0] <= 20000
                dec.close()
            except FlacError:
                pass

    def test_truncations(self, rng):
        x = rng.integers(-5000, 5000, size=(9000, 1), dtype=np.int64).astype(np.int32)
        blob = encode_to_bytes(x, 44100)
        for cut in range(4, len(blob), max(1, len(blob) // 50)):
            try:
                dec = FlacDecoder(blob[:cut])
                dec.read_int(10000)
                dec.close()
            except FlacError:
                pass


class TestParallelDecode:
    """Multi-frame reads fan independent FLAC frames across the codec
    pool (header scan finds boundaries, every body validates its CRC-16,
    the chain must be gapless).  Output must be IDENTICAL to serial
    decode in every case — including corrupt streams, where the batch is
    discarded and the serial resync logic takes over."""

    @pytest.fixture(autouse=True)
    def _restore_threads(self):
        from folve_tpu.audio.flac import set_encoder_threads

        yield
        set_encoder_threads(0)

    def _decode_all(self, blob, chunk=1 << 20):
        dec = FlacDecoder(blob)
        parts = []
        while True:
            got = dec.read_int(chunk)
            if got.shape[0] == 0:
                break
            parts.append(got)
        dec.close()
        if not parts:
            return np.empty((0, 2), np.int32)
        return np.concatenate(parts)

    def _serial_vs_parallel(self, blob, chunk=1 << 20):
        from folve_tpu.audio.flac import set_encoder_threads

        set_encoder_threads(1)
        serial = self._decode_all(blob, chunk)
        set_encoder_threads(4)
        parallel = self._decode_all(blob, chunk)
        np.testing.assert_array_equal(serial, parallel)
        return serial

    @pytest.mark.parametrize("bits", [8, 16, 24])
    def test_bit_identical_to_serial(self, rng, bits):
        lim = 1 << (bits - 1)
        x = rng.integers(-lim, lim, (4096 * 6 + 1234, 2), dtype=np.int64).astype(
            np.int32
        )
        x[3000:9000] //= 64  # tonal-ish region -> varied predictors
        blob = encode_to_bytes(x, 44100, bits=bits)
        got = self._serial_vs_parallel(blob)
        np.testing.assert_array_equal(got, x)

    def test_odd_chunked_reads(self, rng):
        x = rng.integers(-30000, 30000, (4096 * 5 + 77, 2), dtype=np.int64).astype(
            np.int32
        )
        blob = encode_to_bytes(x, 44100)
        # chunk sizes around/below/above one frame, incl. prime sizes
        for chunk in (1, 1000, 4095, 4096, 4097, 9001, 40961):
            got = self._serial_vs_parallel(blob, chunk)
            np.testing.assert_array_equal(got, x)

    def test_third_party_corpus_parallel(self):
        """The vendored libFLAC/libsndfile corpus (all stereo modes,
        wasted bits, RICE2, odd tails) through the parallel path."""
        import json

        corpus = os.path.join(os.path.dirname(__file__), "data", "flac_corpus")
        with open(os.path.join(corpus, "manifest.json")) as f:
            manifest = json.load(f)
        for name in manifest:
            blob = open(os.path.join(corpus, name), "rb").read()
            self._serial_vs_parallel(blob)

    def test_corrupt_streams_match_serial(self, rng):
        """Bitflips anywhere must yield byte-identical results to the
        serial decoder (the parallel batch discards itself on any
        anomaly) — and never crash."""
        x = rng.integers(-20000, 20000, (4096 * 4 + 513, 2), dtype=np.int64).astype(
            np.int32
        )
        blob = bytearray(encode_to_bytes(x, 44100))
        r = np.random.default_rng(99)
        for _ in range(40):
            fuzz = bytearray(blob)
            for _ in range(int(r.integers(1, 6))):
                fuzz[int(r.integers(0, len(fuzz)))] ^= 1 << int(r.integers(0, 8))
            try:
                self._serial_vs_parallel(bytes(fuzz))
            except FlacError:
                pass  # both reject at open; fine

    def test_rewind_then_parallel_again(self, rng):
        from folve_tpu.audio.flac import set_encoder_threads

        x = rng.integers(-20000, 20000, (4096 * 3 + 11, 2), dtype=np.int64).astype(
            np.int32
        )
        blob = encode_to_bytes(x, 44100)
        set_encoder_threads(4)
        dec = FlacDecoder(blob)
        first = dec.read_int(10 ** 9)
        dec.rewind()
        second = dec.read_int(10 ** 9)
        dec.close()
        np.testing.assert_array_equal(first, x)
        np.testing.assert_array_equal(second, x)
