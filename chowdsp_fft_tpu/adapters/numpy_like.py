"""numpy.fft-compatible adapter.

The reference ships a JUCE adapter so existing juce::dsp::FFT users can
switch engines without code changes (/root/reference/chowdsp_fft_juce/).
The equivalent migration surface in the Python/JAX ecosystem is numpy's
fft module: this adapter exposes the framework's engines under np.fft
names and *scaled* conventions (unlike the core API, which is unscaled to
match the reference, /root/reference/chowdsp_fft.h:128).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import api

__all__ = ["fft", "ifft", "rfft", "irfft", "fftfreq", "rfftfreq"]


def _maybe_pad_or_trim(x: jax.Array, n: int | None) -> jax.Array:
    if n is None:
        return x
    t = x.shape[-1]
    if n == t:
        return x
    if n < t:
        return x[..., :n]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - t)])


def fft(a, n: int | None = None, axis: int = -1, engine: str = "auto"):
    a = jnp.moveaxis(jnp.asarray(a), axis, -1)
    a = _maybe_pad_or_trim(a, n)
    out = api.fft(a.astype(jnp.complex64), engine=engine)
    return jnp.moveaxis(out, -1, axis)


def ifft(a, n: int | None = None, axis: int = -1, engine: str = "auto"):
    a = jnp.moveaxis(jnp.asarray(a), axis, -1)
    a = _maybe_pad_or_trim(a, n)
    nn = a.shape[-1]
    out = api.ifft(a.astype(jnp.complex64), engine=engine) * (1.0 / nn)
    return jnp.moveaxis(out, -1, axis)


def rfft(a, n: int | None = None, axis: int = -1, engine: str = "auto"):
    a = jnp.moveaxis(jnp.asarray(a), axis, -1)
    a = _maybe_pad_or_trim(a, n)
    out = api.rfft(a.astype(jnp.float32), engine=engine)
    return jnp.moveaxis(out, -1, axis)


def irfft(a, n: int | None = None, axis: int = -1, engine: str = "auto"):
    a = jnp.moveaxis(jnp.asarray(a), axis, -1)
    if n is None:
        n = 2 * (a.shape[-1] - 1)
    bins = n // 2 + 1
    a = _maybe_pad_or_trim(a, bins).astype(jnp.complex64)
    if n % 2:
        # Odd n (no Nyquist bin): the half-complex core is even-only, so
        # reconstruct via Hermitian extension + a full complex inverse —
        # exactly numpy's semantics, shape (..., n).
        tail = jnp.conj(jnp.flip(a[..., 1:], axis=-1))
        full = jnp.concatenate([a, tail], axis=-1)
        out = jnp.real(api.ifft(full, engine=engine)) * (1.0 / n)
    else:
        out = api.irfft(a, engine=engine) * (1.0 / n)
    return jnp.moveaxis(out, -1, axis)


def fftfreq(n: int, d: float = 1.0):
    return jnp.asarray(np.fft.fftfreq(n, d), jnp.float32)


def rfftfreq(n: int, d: float = 1.0):
    return jnp.asarray(np.fft.rfftfreq(n, d), jnp.float32)
