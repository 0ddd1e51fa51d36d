"""Ogg-encapsulated FLAC (the FLAC-to-Ogg mapping).

Reference parity: libsndfile decodes Ogg-FLAC, so such files must
convolve instead of silently passing through
(convolve-file-handler.cc:62-76).  No tool in this image writes
Ogg-FLAC, so the fixture muxer below wraps our own FLAC encoder's
output per the mapping spec: packet 0 = 0x7F FLAC header + fLaC +
STREAMINFO, one packet per further metadata block, one packet per
frame — including packets split across pages by small page limits.
"""

import os
import struct

import numpy as np
import pytest

from folve_tpu.audio import Container, SampleCodec, read_audio, read_audio_info
from folve_tpu.audio.flac import FlacEncoder, read_flac
from folve_tpu.audio.oggflac import (
    OggFlacError,
    extract_flac_stream,
    read_ogg_flac_metadata,
    sniff_ogg_codec,
)

RATE = 44100


def _crc32_ogg(data: bytes) -> int:
    # Ogg CRC-32: poly 0x04C11DB7, init 0, no reflection, no final xor.
    crc = 0
    for b in data:
        crc ^= b << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
    return crc


def _mux_ogg(packets, max_page_payload=0xFFFF, serial=0x1234):
    """Minimal Ogg muxer: packets -> pages (handles >255 lacing values
    and packet continuation across pages)."""
    # Build the flat lacing/segment stream first.
    segments = []  # (bytes, lacing)
    for pkt in packets:
        off = 0
        while True:
            seg = pkt[off : off + 255]
            segments.append((seg, len(seg)))
            off += len(seg)
            if len(seg) < 255:
                break
    pages = b""
    seq = 0
    i = 0
    continued = False
    while i < len(segments):
        segs = []
        payload = b""
        while (
            i < len(segments)
            and len(segs) < 255
            and len(payload) + segments[i][1] <= max_page_payload
        ):
            payload += segments[i][0]
            segs.append(segments[i][1])
            i += 1
        if not segs:  # single segment larger than the payload cap
            payload = segments[i][0]
            segs = [segments[i][1]]
            i += 1
        htype = 0
        if seq == 0:
            htype |= 0x02  # BOS
        if continued:
            htype |= 0x01
        if i >= len(segments):
            htype |= 0x04  # EOS
        header = (
            b"OggS\x00"
            + bytes([htype])
            + struct.pack("<q", 0)  # granule (unused by the demuxer)
            + struct.pack("<I", serial)
            + struct.pack("<I", seq)
            + struct.pack("<I", 0)  # crc placeholder
            + bytes([len(segs)])
            + bytes(segs)
        )
        crc = _crc32_ogg(header + payload)
        header = header[:22] + struct.pack("<I", crc) + header[26:]
        pages += header + payload
        continued = segs[-1] == 255
        seq += 1
    return pages


def make_ogg_flac(path, x, rate=RATE, bits=16, max_page_payload=0xFFFF,
                  blocksize=1024):
    """Encode x as FLAC and wrap it in Ogg per the mapping."""
    enc = FlacEncoder(rate, x.shape[1], bits=bits, blocksize=blocksize,
                      total_frames_hint=x.shape[0])
    header = enc.header()  # fLaC + STREAMINFO(38) + PADDING(20)
    assert header[:4] == b"fLaC"
    streaminfo = header[4:42]
    padding = header[42:]
    frames = []
    for off in range(0, x.shape[0], blocksize):
        chunk = enc.write_float(x[off : off + blocksize])
        if chunk:
            frames.append(chunk)
    tail = enc.finish()
    if tail:
        frames.append(tail)
    # Patch the final STREAMINFO (frame counts, MD5) into the stream.
    streaminfo = streaminfo[:4] + enc.streaminfo(with_md5=True)
    packets = [
        b"\x7fFLAC\x01\x00" + struct.pack(">H", 1) + b"fLaC" + streaminfo,
        padding,
    ] + frames
    with open(path, "wb") as f:
        f.write(_mux_ogg(packets, max_page_payload=max_page_payload))
    return enc


@pytest.fixture
def material(rng):
    x = rng.uniform(-0.5, 0.5, (9000, 2)).astype(np.float32)
    return np.round(x * 32768) / 32768


def test_sniff(tmp_path, material):
    p = tmp_path / "a.oga"
    make_ogg_flac(str(p), material)
    assert sniff_ogg_codec(str(p)) == "flac"


def test_decodes_bit_exact(tmp_path, material):
    p = tmp_path / "a.oga"
    make_ogg_flac(str(p), material)
    got, info = read_audio(str(p))
    assert info.container == Container.OGG
    assert info.codec == SampleCodec.FLAC
    assert info.rate == RATE and info.channels == 2
    np.testing.assert_array_equal(got, material)


def test_small_pages_split_packets(tmp_path, material):
    """Packets spanning multiple pages (continuation flag) reassemble."""
    p = tmp_path / "split.oga"
    make_ogg_flac(str(p), material, max_page_payload=300)
    got, info = read_audio(str(p))
    np.testing.assert_array_equal(got, material)


def test_extract_equals_native_stream(tmp_path, material):
    """The unwrapped stream is a spec-valid native FLAC file."""
    p = tmp_path / "a.oga"
    make_ogg_flac(str(p), material)
    with open(p, "rb") as f:
        native = extract_flac_stream(f.read())
    assert native[:4] == b"fLaC"
    got, info = read_flac(native)
    np.testing.assert_array_equal(got, material)


def test_info_and_metadata(tmp_path, material):
    p = tmp_path / "a.oga"
    make_ogg_flac(str(p), material, bits=24)
    info = read_audio_info(str(p))
    assert info.bits_per_sample == 24
    assert info.frames == material.shape[0]
    assert read_ogg_flac_metadata(str(p)) == {}


def test_not_ogg_flac(tmp_path):
    p = tmp_path / "x.oga"
    p.write_bytes(b"OggS" + b"\0" * 60)
    with pytest.raises((OggFlacError, ValueError)):
        extract_flac_stream(p.read_bytes())


def test_through_filesystem_keeps_depth(tmp_path, rng, material):
    """Ogg-FLAC convolves and keeps its lossless source depth (24-bit
    in, FLAC/24 out — vorbis would map to FLAC/16)."""
    from tests.test_runtime import make_fs, read_all

    fs, src_dir = make_fs(tmp_path)
    make_ogg_flac(str(src_dir / "song.oga"), material, bits=24)
    h = fs.get_or_create_handler("/song.oga")
    blob = read_all(h)
    fs.close_handler("/song.oga", h)
    assert blob[:4] == b"fLaC"
    got, info = read_flac(blob)
    assert info.bits_per_sample == 24
    assert info.frames == material.shape[0]
