"""Frequency-domain convolution helpers.

TPU equivalents of the reference's convolution primitives:
- ``convolve_accumulate`` <-> ``fft_convolve_unordered`` /
  ``pffft_convolve_internal`` (/root/reference/chowdsp_fft.cpp:398-432,
  simd/chowdsp_fft_impl_sse.cpp:1603-1645): ab += a * b * scaling on
  frequency-domain data.
- ``accumulate`` <-> ``fft_accumulate`` / ``fft_accumulate_internal``
  (/root/reference/chowdsp_fft.cpp:434-452, sse:1647-1660): ab = a + b.

Because this framework's spectra are canonical complex arrays (DC and
Nyquist are their own bins), no scalar patch-up of a packed DC/Nyquist
element is needed — the reference needs one because pffft's real layout
packs Nyquist into the DC slot (sse:1640-1644). The ops are plain
elementwise math: under jit XLA fuses them into neighboring kernels, which
is the TPU analog of the reference's hand-unrolled SIMD loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["convolve_accumulate", "multiply_spectra", "accumulate"]


def convolve_accumulate(
    a: jax.Array,
    b: jax.Array,
    ab: jax.Array | None = None,
    scaling: float | jax.Array = 1.0,
) -> jax.Array:
    """Return ``ab + a * b * scaling`` over frequency-domain arrays.

    ``a``/``b`` are spectra from a forward transform (ordered or unordered —
    the op is order-independent, which is exactly why the reference pairs it
    with its unordered transforms, /root/reference/chowdsp_fft.h:140-154).
    ``ab=None`` means accumulate into zero (plain scaled product). The
    functional return replaces the reference's in-place += (aliasing
    pointers); under jit XLA buffer-donates this to the same thing.
    """
    prod = a * b
    if scaling != 1.0:
        prod = prod * jnp.asarray(scaling, dtype=prod.dtype if not jnp.iscomplexobj(prod) else jnp.float32)
    if ab is None:
        return prod
    return ab + prod


def multiply_spectra(a: jax.Array, b: jax.Array, scaling: float | jax.Array = 1.0) -> jax.Array:
    """Scaled spectral product (convolve_accumulate with zero accumulator)."""
    return convolve_accumulate(a, b, ab=None, scaling=scaling)


def accumulate(a: jax.Array, b: jax.Array) -> jax.Array:
    """Elementwise sum of two signals (``fft_accumulate``,
    /root/reference/chowdsp_fft.h:156-160). The reference restricts N to a
    multiple of the SIMD width (sse:1647-1660); no such restriction exists
    here — the VPU tile handles any shape."""
    return a + b
