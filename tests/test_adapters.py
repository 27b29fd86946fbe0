"""Adapter tests: numpy.fft parity and juce::dsp::FFT behavioral parity."""

import numpy as np
import pytest

from chowdsp_fft_tpu.adapters import numpy_like as nl
from chowdsp_fft_tpu.adapters import JuceStyleFFT


def test_numpy_like_fft_ifft(rng):
    z = (rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(nl.fft(z)), np.fft.fft(z), atol=1e-3)
    np.testing.assert_allclose(np.asarray(nl.ifft(z)), np.fft.ifft(z), atol=1e-5)


def test_numpy_like_rfft_irfft_scaled(rng):
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(nl.rfft(x)), np.fft.rfft(x), atol=1e-3)
    s = np.fft.rfft(x).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(nl.irfft(s)), np.fft.irfft(s), atol=1e-5)


def test_numpy_like_axis_and_n(rng):
    x = rng.standard_normal((64, 5)).astype(np.float32)
    got = np.asarray(nl.rfft(x, axis=0))
    np.testing.assert_allclose(got, np.fft.rfft(x, axis=0), atol=1e-4)
    got = np.asarray(nl.fft(x[:, 0] + 0j, n=128))
    np.testing.assert_allclose(got, np.fft.fft(x[:, 0], n=128), atol=1e-4)


def test_numpy_like_freqs():
    np.testing.assert_allclose(np.asarray(nl.fftfreq(64, 0.5)), np.fft.fftfreq(64, 0.5), atol=0)
    np.testing.assert_allclose(np.asarray(nl.rfftfreq(64)), np.fft.rfftfreq(64), atol=0)


def test_juce_complex_roundtrip(rng):
    f = JuceStyleFFT(order=9)  # 512
    assert f.get_size() == 512
    z = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
    fwd = np.asarray(f.perform(z))
    np.testing.assert_allclose(fwd, np.fft.fft(z), atol=1e-3)
    back = np.asarray(f.perform(fwd, inverse=True))
    np.testing.assert_allclose(back, z, atol=1e-5)  # JUCE: inverse scaled


def test_juce_real_layout(rng):
    f = JuceStyleFFT(order=8)  # 256
    x = rng.standard_normal(256).astype(np.float32)
    buf = np.asarray(f.perform_real_only_forward_transform(x))
    assert buf.shape == (258,)  # (N/2 + 1) complex interleaved
    ref = np.fft.rfft(x.astype(np.float64))
    np.testing.assert_allclose(buf[0::2], ref.real, atol=1e-4)
    np.testing.assert_allclose(buf[1::2], ref.imag, atol=1e-4)
    back = np.asarray(f.perform_real_only_inverse_transform(buf))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_juce_frequency_only(rng):
    f = JuceStyleFFT(order=6)
    x = rng.standard_normal(64).astype(np.float32)
    mags = np.asarray(f.perform_frequency_only_forward_transform(x))
    assert mags.shape == (64,)
    np.testing.assert_allclose(mags[:33], np.abs(np.fft.rfft(x)), atol=1e-4)
    assert np.all(mags[33:] == 0)


def test_juce_small_order(rng):
    # Reference delegates order < 5 to other engines (:18-30); we must
    # still produce correct results at tiny sizes.
    f = JuceStyleFFT(order=2)
    z = (rng.standard_normal(4) + 1j * rng.standard_normal(4)).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(f.perform(z)), np.fft.fft(z), atol=1e-5)


def test_numpy_like_irfft_odd_n(rng):
    from chowdsp_fft_tpu.adapters import numpy_like

    spec = (rng.standard_normal(5) + 1j * rng.standard_normal(5)).astype(np.complex64)
    got = np.asarray(numpy_like.irfft(spec, n=9))
    ref = np.fft.irfft(spec.astype(np.complex128), n=9)
    assert got.shape == (9,)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_juce_small_orders(rng):
    """Orders 1-4 (sizes 2..16) work through the adapter — the reference
    delegates these to other engines (order >= 5 check at
    chowdsp_fft_juce.cpp:18-30); here the portable engine covers them.
    Order 1 regression: real N=2 was rejected by is_valid_size."""
    from chowdsp_fft_tpu.adapters import JuceStyleFFT

    for order in (1, 2, 4):
        n = 1 << order
        f = JuceStyleFFT(order)
        x = rng.standard_normal(n).astype(np.float32)
        out = np.asarray(f.perform_real_only_forward_transform(x))
        ref = np.fft.rfft(x.astype(np.float64))
        got = out[: 2 * (n // 2 + 1)].view(np.float32)
        spec = got[0::2] + 1j * got[1::2]
        assert np.abs(spec - ref).max() < 1e-4, order
