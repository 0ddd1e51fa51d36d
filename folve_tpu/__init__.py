"""folve_tpu — a TPU-native streaming-convolution framework.

A from-scratch rebuild of the capabilities of hzeller/folve (a FUSE
filesystem that convolves FLAC/audio files on the fly with FIR filters)
as a TPU-first framework:

* the DSP core is pure JAX / Pallas: uniform partitioned FFT convolution
  executed as batched device steps over many streams and many blocks at
  once (see ``folve_tpu.engine``),
* the filter-config layer speaks the jconvolver config language and the
  ``filter-<rate>[-<ch>[-<bits>]].conf`` resolution scheme
  (see ``folve_tpu.filters``),
* the host runtime mirrors the reference's streaming behaviors —
  conversion buffers, prefetch, handler cache, processor pool, gapless
  handover (see ``folve_tpu.runtime``),
* audio IO (WAV/FLAC decode + encode) is implemented natively in this
  repo (see ``folve_tpu.audio``) — no libsndfile dependency.

Reference behavior citations in docstrings point into hzeller/folve
sources as ``<file>:<line>``.
"""

from folve_tpu.version import __version__

__all__ = ["__version__"]


def __getattr__(name):
    """Lazy top-level convenience exports (keeps `import folve_tpu`
    cheap — jax only loads when the engine is touched)."""
    if name in ("FilterBank", "compile_filter_bank", "chunk_step", "block_step",
                "init_state", "StreamState"):
        import folve_tpu.engine as engine

        return getattr(engine, name)
    if name == "FolveFilesystem":
        from folve_tpu.runtime import FolveFilesystem

        return FolveFilesystem
    if name == "compile_config_file":
        from folve_tpu.filters import compile_config_file

        return compile_config_file
    raise AttributeError(name)
