"""Sony Wave64 (.w64) — native reader and streaming encoder.

Wave64 is WAV with 16-byte GUID chunk ids and 64-bit sizes (the RIFF
4 GiB limit removed); the fmt/data payloads are byte-identical to
WAV's.  The reference consumes it through libsndfile's probe
(convolve-file-handler.cc:62-76) and writes the original format back.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from folve_tpu.audio.pcm_stream import PcmStreamEncoderBase
from folve_tpu.audio.types import AudioInfo, Container, SampleCodec


class W64Error(ValueError):
    pass


_TAIL = bytes([0xF3, 0xAC, 0xD3, 0x11, 0x8C, 0xD1, 0x00, 0xC0, 0x4F, 0x8E,
               0xDB, 0x8A])
GUID_RIFF = b"riff" + bytes([0x2E, 0x91, 0xCF, 0x11, 0xA5, 0xD6, 0x28, 0xDB,
                             0x04, 0xC1, 0x00, 0x00])
GUID_WAVE = b"wave" + _TAIL
GUID_FMT = b"fmt " + _TAIL
GUID_DATA = b"data" + _TAIL

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_IEEE_FLOAT = 3
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7
WAVE_FORMAT_GSM610 = 0x31  # Microsoft GSM 6.10 (WAV49 framing)
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def _align8(n: int) -> int:
    return (n + 7) & ~7


def _parse(blob: bytes):
    if len(blob) < 40 or blob[:16] != GUID_RIFF or blob[24:40] != GUID_WAVE:
        raise W64Error("not a Wave64 file")
    pos = 40
    fmt = None
    data_off = data_len = None
    while pos + 24 <= len(blob):
        guid = blob[pos : pos + 16]
        # Chunk size INCLUDES the 24-byte chunk header (Wave64 quirk).
        (size,) = struct.unpack("<Q", blob[pos + 16 : pos + 24])
        if size < 24:
            raise W64Error("bad chunk size")
        body = blob[pos + 24 : pos + size]
        if guid == GUID_FMT:
            fmt = body
        elif guid == GUID_DATA:
            data_off, data_len = pos + 24, min(size - 24, len(blob) - pos - 24)
        pos += _align8(size)
    if fmt is None or data_off is None:
        raise W64Error("missing fmt/data chunks")
    if len(fmt) < 16:
        raise W64Error("short fmt chunk")
    tag, channels, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag == WAVE_FORMAT_EXTENSIBLE and len(fmt) >= 26:
        (tag,) = struct.unpack("<H", fmt[24:26])  # subformat GUID head
    if tag == WAVE_FORMAT_GSM610:
        if channels != 1:
            raise W64Error("GSM 6.10 is mono-only")
        bits = 16  # fmt declares 0 bits; decode is 16-bit
    if channels == 0 or rate == 0 or bits == 0:
        raise W64Error("bad fmt fields")
    return tag, channels, rate, bits, data_off, data_len


_CODEC = {
    (WAVE_FORMAT_PCM, 8): SampleCodec.PCM_U8,
    (WAVE_FORMAT_PCM, 16): SampleCodec.PCM_16,
    (WAVE_FORMAT_PCM, 24): SampleCodec.PCM_24,
    (WAVE_FORMAT_PCM, 32): SampleCodec.PCM_32,
    (WAVE_FORMAT_IEEE_FLOAT, 32): SampleCodec.FLOAT,
    (WAVE_FORMAT_IEEE_FLOAT, 64): SampleCodec.DOUBLE,
    (WAVE_FORMAT_ALAW, 8): SampleCodec.ALAW,
    (WAVE_FORMAT_MULAW, 8): SampleCodec.ULAW,
}

# G.711 stores one byte per sample but decodes to 16-bit range.
_STORAGE_OVERRIDE = {SampleCodec.ALAW: 1, SampleCodec.ULAW: 1}
_BITS_OVERRIDE = {SampleCodec.ALAW: 16, SampleCodec.ULAW: 16}


def _decode_payload(raw: bytes, codec, bits: int, channels: int) -> np.ndarray:
    """Raw data bytes (any whole-frame slice) -> float32 [n, ch].
    Truncated payloads short-decode rather than raising from frombuffer."""
    elem = _STORAGE_OVERRIDE.get(codec, max(1, bits // 8))
    raw = raw[: (len(raw) // elem) * elem]
    if codec == SampleCodec.ULAW:
        from folve_tpu.audio.au import _mulaw_table

        data = _mulaw_table()[np.frombuffer(raw, np.uint8)].astype(np.float32) / 32768.0
    elif codec == SampleCodec.ALAW:
        from folve_tpu.audio.au import _alaw_table

        data = _alaw_table()[np.frombuffer(raw, np.uint8)].astype(np.float32) / 32768.0
    elif codec == SampleCodec.PCM_U8:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif codec == SampleCodec.PCM_16:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif codec == SampleCodec.PCM_24:
        b = np.frombuffer(raw[: (len(raw) // 3) * 3], np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        data = v.astype(np.float32) / float(1 << 23)
    elif codec == SampleCodec.PCM_32:
        data = np.frombuffer(raw, "<i4").astype(np.float64) / float(1 << 31)
    elif codec == SampleCodec.FLOAT:
        data = np.frombuffer(raw, "<f4").astype(np.float64)
    else:
        data = np.frombuffer(raw, "<f8")
    data = np.asarray(data, np.float32)
    n = data.size // channels
    return data[: n * channels].reshape(n, channels)


def read_w64(path: str) -> tuple[np.ndarray, AudioInfo]:
    with open(path, "rb") as f:
        blob = f.read()
    tag, channels, rate, bits, off, length = _parse(blob)
    if tag == WAVE_FORMAT_GSM610:
        from folve_tpu.audio.gsm import decode_gsm

        data = decode_gsm(blob[off : off + length], wav49=True)
        info = AudioInfo(
            rate=rate, channels=1, frames=data.shape[0],
            container=Container.W64, codec=SampleCodec.GSM610,
            bits_per_sample=16, block_align=65, samples_per_block=320,
        )
        return data, info
    codec = _CODEC.get((tag, bits))
    if codec is None:
        raise W64Error(f"unsupported format tag={tag} bits={bits}")
    data = _decode_payload(blob[off : off + length], codec, bits, channels)
    info = AudioInfo(
        rate=rate, channels=channels, frames=data.shape[0],
        container=Container.W64, codec=codec,
        bits_per_sample=_BITS_OVERRIDE.get(codec, bits),
    )
    return data, info


def open_w64_stream(path: str):
    """(file, info, data_offset, frame_bytes, decode) for a chunked
    source — only the chunk directory is read up front, so a multi-GB
    Wave64 costs constant memory per open stream."""
    f = open(path, "rb")
    try:
        blob = f.read(1 << 16)
        f.seek(0, 2)
        total = f.tell()
        if len(blob) < 40 or blob[:16] != GUID_RIFF or blob[24:40] != GUID_WAVE:
            raise W64Error("not a Wave64 file")
        pos = 40
        fmt = None
        data_off = data_len = None
        while pos + 24 <= len(blob):
            guid = blob[pos : pos + 16]
            (size,) = struct.unpack("<Q", blob[pos + 16 : pos + 24])
            if size < 24:
                raise W64Error("bad chunk size")
            if guid == GUID_FMT:
                fmt = blob[pos + 24 : pos + size]
            elif guid == GUID_DATA:
                data_off = pos + 24
                data_len = min(size - 24, total - pos - 24)
            pos += _align8(size)
            if fmt is not None and data_len is not None:
                break
        if fmt is None or data_off is None or len(fmt) < 16:
            raise W64Error("missing fmt/data chunks")
        tag, channels, rate, _brate, _balign, bits = struct.unpack(
            "<HHIIHH", fmt[:16]
        )
        if tag == WAVE_FORMAT_EXTENSIBLE and len(fmt) >= 26:
            (tag,) = struct.unpack("<H", fmt[24:26])
        if tag == WAVE_FORMAT_GSM610:
            if channels != 1:
                raise W64Error("GSM 6.10 is mono-only")
            from folve_tpu.audio.gsm import GsmSource, gsm_frames_in

            info = AudioInfo(
                rate=rate, channels=1,
                frames=gsm_frames_in(int(data_len), wav49=True),
                container=Container.W64, codec=SampleCodec.GSM610,
                bits_per_sample=16, block_align=65, samples_per_block=320,
            )
            src = GsmSource(f, info, data_off, int(data_len), wav49=True)
            return None, src, data_off, 0, None
        codec = _CODEC.get((tag, bits))
        if codec is None or channels == 0:
            raise W64Error("unsupported w64 format")
        storage = _STORAGE_OVERRIDE.get(codec, bits // 8)
        frames = int(data_len) // (channels * storage)
        info = AudioInfo(
            rate=rate, channels=channels, frames=frames,
            container=Container.W64, codec=codec,
            bits_per_sample=_BITS_OVERRIDE.get(codec, bits),
        )
    except Exception:
        f.close()
        raise
    frame_bytes = channels * storage
    return f, info, data_off, frame_bytes, (
        lambda raw: _decode_payload(raw, codec, bits, channels)
    )


def read_w64_info(path: str) -> AudioInfo:
    f, src_or_info, _off, _fb, _dec = open_w64_stream(path)
    if f is None:  # GSM: ready-made source in slot 1
        info = src_or_info.info
        src_or_info.close()
        return info
    f.close()
    return src_or_info


class W64StreamEncoder(PcmStreamEncoderBase):
    """Streaming Wave64 encoder: little-endian PCM behind an exact-size
    header."""

    _little_endian = True
    _error = W64Error

    def header(self, metadata: Optional[dict] = None) -> bytes:
        del metadata  # W64 has no standard tag chunk
        payload = self.total_frames * self.channels * self.bits // 8
        balign = self.channels * self.bits // 8
        fmt = struct.pack(
            "<HHIIHH", WAVE_FORMAT_PCM, self.channels, self.rate,
            self.rate * balign, balign, self.bits,
        )
        fmt_chunk = GUID_FMT + struct.pack("<Q", 24 + len(fmt)) + fmt
        fmt_chunk += b"\0" * (_align8(len(fmt_chunk)) - len(fmt_chunk))
        data_hdr = GUID_DATA + struct.pack("<Q", 24 + payload)
        total = 40 + len(fmt_chunk) + len(data_hdr) + payload
        return (
            GUID_RIFF + struct.pack("<Q", total) + GUID_WAVE
            + fmt_chunk + data_hdr
        )


def write_w64(dst, data: np.ndarray, rate: int, bits: int = 16) -> None:
    """Encode float32 [frames, ch] as little-endian PCM Wave64."""
    if data.ndim == 1:
        data = data[:, None]
    enc = W64StreamEncoder(rate, data.shape[1], bits, data.shape[0])
    blob = enc.header() + enc.write_float(data)
    if hasattr(dst, "write"):
        dst.write(blob)
    else:
        with open(dst, "wb") as f:
            f.write(blob)
