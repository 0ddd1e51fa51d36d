"""Ogg Vorbis decoding via the system's libvorbisfile (ctypes).

The reference consumes Vorbis through libsndfile's libvorbis backend
(README.md's ogg support; output re-encoded as FLAC because ogg can't
be streamed out, convolve-file-handler.cc:237-243).  This image ships
no libsndfile, but libvorbisfile/libvorbis/libogg are present (bundled
with pygame's SDL stack); we bind them directly.  If no library can be
found, ogg files simply fall back to pass-through like any other
undecodable input.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import glob
import os
from typing import Optional

import numpy as np

from folve_tpu.audio.types import AudioInfo, Container, SampleCodec


class OggError(ValueError):
    pass


class _VorbisInfo(ctypes.Structure):
    _fields_ = [
        ("version", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("rate", ctypes.c_long),
        ("bitrate_upper", ctypes.c_long),
        ("bitrate_nominal", ctypes.c_long),
        ("bitrate_lower", ctypes.c_long),
        ("bitrate_window", ctypes.c_long),
        ("codec_setup", ctypes.c_void_p),
    ]


class _VorbisComment(ctypes.Structure):
    _fields_ = [
        ("user_comments", ctypes.POINTER(ctypes.c_char_p)),
        ("comment_lengths", ctypes.POINTER(ctypes.c_int)),
        ("comments", ctypes.c_int),
        ("vendor", ctypes.c_char_p),
    ]


_lib = None
_lib_tried = False


def _find_vorbisfile() -> Optional[str]:
    candidates = []
    for pattern in (
        "/opt/venv/lib/python*/site-packages/pygame.libs/libvorbisfile*.so*",
        "/usr/lib/*/libvorbisfile.so*",
        "/usr/local/lib/libvorbisfile.so*",
    ):
        candidates.extend(sorted(glob.glob(pattern)))
    found = ctypes.util.find_library("vorbisfile")
    if found:
        candidates.append(found)
    return candidates[0] if candidates else None


def _get_lib():
    global _lib, _lib_tried
    if _lib is None and not _lib_tried:
        _lib_tried = True
        path = _find_vorbisfile()
        if path is None:
            return None
        try:
            # Preload dependencies living alongside (libogg, libvorbis)
            # with global visibility so the loader can resolve them.
            libdir = os.path.dirname(path)
            for dep_pat in ("libogg*.so*", "libvorbis-*.so*", "libvorbis.so*"):
                for dep in sorted(glob.glob(os.path.join(libdir, dep_pat))):
                    try:
                        ctypes.CDLL(dep, mode=ctypes.RTLD_GLOBAL)
                    except OSError:
                        pass
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.ov_fopen.restype = ctypes.c_int
        lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_info.restype = ctypes.POINTER(_VorbisInfo)
        lib.ov_pcm_total.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_pcm_total.restype = ctypes.c_int64
        lib.ov_read_float.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ov_read_float.restype = ctypes.c_long
        lib.ov_clear.argtypes = [ctypes.c_void_p]
        lib.ov_comment.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_comment.restype = ctypes.POINTER(_VorbisComment)
        _lib = lib
    return _lib


def vorbis_available() -> bool:
    return _get_lib() is not None


_OV_FILE_SIZE = 2048  # opaque OggVorbis_File; real struct is ~944 bytes


class OggSource:
    """Streaming Vorbis decode source (AudioSource protocol)."""

    def __init__(self, path: str):
        lib = _get_lib()
        if lib is None:
            raise OggError("no libvorbisfile available")
        self._lib = lib
        self._vf = ctypes.create_string_buffer(_OV_FILE_SIZE)
        r = lib.ov_fopen(path.encode(), self._vf)
        if r != 0:
            raise OggError(f"cannot open ogg stream ({r})")
        vi = lib.ov_info(self._vf, -1)
        if not vi:
            lib.ov_clear(self._vf)
            raise OggError("no vorbis info")
        frames = lib.ov_pcm_total(self._vf, -1)
        self.info = AudioInfo(
            rate=int(vi.contents.rate),
            channels=int(vi.contents.channels),
            frames=max(0, int(frames)),
            container=Container.OGG,
            codec=SampleCodec.VORBIS,
            bits_per_sample=16,  # nominal; vorbis is float internally
        )
        self._open = True

    def read_float(self, nframes: int) -> np.ndarray:
        ch = self.info.channels
        out = np.empty((nframes, ch), dtype=np.float32)
        got = 0
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bitstream = ctypes.c_int(0)
        while got < nframes:
            n = self._lib.ov_read_float(
                self._vf, ctypes.byref(pcm), nframes - got, ctypes.byref(bitstream)
            )
            if n <= 0:
                break
            for c in range(ch):
                out[got : got + n, c] = np.ctypeslib.as_array(pcm[c], shape=(n,))
            got += n
        return out[:got]

    def close(self) -> None:
        if self._open:
            self._lib.ov_clear(self._vf)
            self._open = False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def read_ogg(path: str) -> tuple[np.ndarray, AudioInfo]:
    src = OggSource(path)
    chunks = []
    while True:
        blk = src.read_float(65536)
        if blk.shape[0] == 0:
            break
        chunks.append(blk)
    info = src.info
    src.close()
    data = (
        np.concatenate(chunks)
        if chunks
        else np.zeros((0, info.channels), dtype=np.float32)
    )
    info.frames = data.shape[0]
    return data, info


def read_ogg_info(path: str) -> AudioInfo:
    src = OggSource(path)
    info = src.info
    src.close()
    return info


def read_ogg_comments(path: str) -> dict:
    """Vorbis comments as a vorbis-style tag dict (the reference carries
    these into the FLAC output via sf_get_string/sf_set_string,
    convolve-file-handler.cc:484-495)."""
    lib = _get_lib()
    if lib is None:
        return {}
    vf = ctypes.create_string_buffer(_OV_FILE_SIZE)
    if lib.ov_fopen(path.encode(), vf) != 0:
        return {}
    out = {}
    try:
        vc = lib.ov_comment(vf, -1)
        if vc:
            for i in range(vc.contents.comments):
                ln = vc.contents.comment_lengths[i]
                raw = ctypes.string_at(vc.contents.user_comments[i], ln)
                item = raw.decode("utf-8", errors="replace")
                if "=" in item:
                    k, v = item.split("=", 1)
                    out[k.upper()] = v
    finally:
        lib.ov_clear(vf)
    return out
