"""FilterBank — a FIR filter compiled for the TPU partitioned-convolution engine.

The reference hands a dense impulse response to zita-convolver's
``Convproc`` which internally partitions it uniformly (partition length =
``fragm``) and stores forward FFTs of every partition
(reference: zita-fconfig.cc:78-94, sound-processor.cc:34-49).

Here the compiled artifact is explicit: ``h_spec`` holds the DFT of every
zero-padded partition for every (input-channel, output-channel) pair, laid
out ``[P, Cin, Cout, 2, K]`` — real/imag planes (the target TPU backend
has no complex dtype) with ``K = 2*fragm`` bins of a ``2*fragm``-point DFT
in the *permuted* Cooley-Tukey layout of :mod:`folve_tpu.engine.rfft`.
This is the HBM-resident tensor the per-block frequency-domain MAC
contracts against.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from folve_tpu.engine.constants import (
    MAXINP,
    MAXOUT,
    MAXSIZE,
    derive_fragm,
    num_partitions,
)
from folve_tpu.engine.rfft import permute_spectrum


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FilterBank:
    """Compiled filter partitions in the frequency domain.

    ``h_spec``: float32 ``[P, Cin, Cout, 2, K]`` — DFT(2*fragm) of each
    zero-padded ``fragm``-tap partition, real/imag planes, permuted bin
    layout.  Entry ``[p, i, o]`` is the spectrum of taps
    ``[p*fragm, (p+1)*fragm)`` of the impulse response from input
    channel ``i`` to output channel ``o``.
    """

    h_spec: jax.Array
    fragm: int = dataclasses.field(metadata=dict(static=True))
    size: int = dataclasses.field(metadata=dict(static=True))

    @property
    def partitions(self) -> int:
        return self.h_spec.shape[0]

    @property
    def ninp(self) -> int:
        return self.h_spec.shape[1]

    @property
    def nout(self) -> int:
        return self.h_spec.shape[2]

    @property
    def bins(self) -> int:
        return self.h_spec.shape[4]


def compile_filter_bank(
    ir: np.ndarray,
    fragm: Optional[int] = None,
    size: Optional[int] = None,
    layout: str = "half",
) -> FilterBank:
    """Compile a dense impulse-response tensor into a :class:`FilterBank`.

    ``ir``: float array ``[Cin, Cout, L]`` — the accumulated impulse
    response per channel pair (the filter compiler in
    ``folve_tpu.filters.compiler`` produces this from jconvolver configs).

    ``size``: declared filter length (the ``maxsize`` field of
    ``/convolver/new``); defaults to ``L``.  ``fragm`` defaults to the
    reference's derivation from ``size`` (zita-fconfig.cc:74-77).
    ``layout``: "half" (default) stores only the conjugate-symmetric
    half-spectrum rectangle (halves MAC traffic; see engine.rfft);
    "full" keeps all bins (required by the freq-sharded serving path).
    """
    planes, fragm, size = compute_spectra_planes(ir, fragm, size, layout)
    return FilterBank(h_spec=jnp.asarray(planes), fragm=fragm, size=size)


def compute_spectra_planes(
    ir: np.ndarray,
    fragm: Optional[int] = None,
    size: Optional[int] = None,
    layout: str = "half",
):
    """Host-side spectra computation behind :func:`compile_filter_bank`;
    returns ``(planes, fragm, size)`` with ``planes`` still a numpy
    array (callers that persist spectra use this to avoid fetching them
    back off the device)."""
    ir = np.asarray(ir, dtype=np.float32)
    if ir.ndim != 3:
        raise ValueError(f"ir must be [Cin, Cout, L], got shape {ir.shape}")
    cin, cout, length = ir.shape
    if not (1 <= cin <= MAXINP):
        raise ValueError(f"number of inputs ({cin}) is out of range")
    if not (1 <= cout <= MAXOUT):
        raise ValueError(f"number of outputs ({cout}) is out of range")
    if size is None:
        size = length
    if size > MAXSIZE:
        raise ValueError(f"convolver size ({size}) is out of range")
    if length > size:
        raise ValueError(f"impulse response ({length}) longer than size ({size})")
    if fragm is None:
        fragm = derive_fragm(size)
    p = num_partitions(size, fragm)

    padded = np.zeros((cin, cout, p * fragm), dtype=np.float64)
    padded[:, :, :length] = ir
    parts = padded.reshape(cin, cout, p, fragm)
    # Full DFT of each partition zero-padded to 2*fragm, then reorder into
    # the engine's permuted Cooley-Tukey bin layout.
    spec = np.fft.fft(parts, n=2 * fragm, axis=-1)
    spec = permute_spectrum(spec, 2 * fragm, half=(layout == "half"))
    # [Cin, Cout, P, K] -> [P, Cin, Cout, 2, K] real/imag planes.
    spec = np.transpose(spec, (2, 0, 1, 3))
    planes = np.stack([spec.real, spec.imag], axis=3).astype(np.float32)
    return planes, fragm, size
