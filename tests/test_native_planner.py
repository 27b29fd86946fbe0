"""Native C++ planner: build, bind, and agree with numpy float64."""

import numpy as np
import pytest

from chowdsp_fft_tpu.utils import native
from chowdsp_fft_tpu import plans


@pytest.fixture(scope="module")
def lib():
    lb = native.get_lib()
    if lb is None:
        pytest.skip("native toolchain unavailable")
    return lb


def test_native_factorize(lib):
    assert native.factorize(4096) == (4,) * 6
    assert native.factorize(480) == plans.factorize(480)
    assert native.factorize(7) is None


@pytest.mark.parametrize("n", [32, 96, 1024, 4096, 1 << 20])
def test_native_stage_twiddles_match_numpy(n, lib):
    tables = native.stage_twiddles(n)
    radices = plans.factorize(n)
    assert len(tables) == len(radices)
    sub = n
    for (re, im), r in zip(tables, radices):
        m = sub // r
        j = np.arange(r)[:, None]
        p = np.arange(m)[None, :]
        ang = -2 * np.pi * (j * p % sub) / sub
        np.testing.assert_allclose(re, np.cos(ang), atol=1e-14)
        np.testing.assert_allclose(im, np.sin(ang), atol=1e-14)
        sub = m


def test_native_rfft_twiddles(lib):
    n = 8192
    re, im = native.rfft_twiddles(n)
    k = np.arange(n // 2)
    np.testing.assert_allclose(re, np.cos(-2 * np.pi * k / n), atol=1e-14)
    np.testing.assert_allclose(im, np.sin(-2 * np.pi * k / n), atol=1e-14)


def test_native_dft_matrix_unitary(lib):
    l = 128
    re, im = native.dft_matrix(l)
    M = re + 1j * im
    np.testing.assert_allclose(M @ M.conj().T / l, np.eye(l), atol=1e-12)


def test_native_fourstep(lib):
    n, lanes = 4096, 128
    re, im = native.fourstep_twiddles(n, lanes)
    k1 = np.arange(n // lanes)[:, None]
    n2 = np.arange(lanes)[None, :]
    ang = -2 * np.pi * (k1 * n2 % n) / n
    np.testing.assert_allclose(re, np.cos(ang), atol=1e-14)
    np.testing.assert_allclose(im, np.sin(ang), atol=1e-14)


def test_plans_use_native_when_available(lib):
    # A plan built while the native planner is available must still produce
    # a correct FFT (integration through plans._plan_tables_np).
    import chowdsp_fft_tpu as cf

    plans._plan_tables_np.cache_clear()
    x = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32)
    got = np.asarray(cf.rfft(x, engine="stockham"))
    ref = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-7 * 1024, rtol=0)


def test_roofline_sanity():
    from chowdsp_fft_tpu.utils.roofline import fft_roofline, conv_roofline

    r = fft_roofline(4096, 1024, "real")
    # fp32 merge-matmul puts this config near the memory/compute crossover
    assert r.bound in ("memory", "compute")
    assert 20e9 < r.samples_per_s < 200e9
    assert r.seconds_memory > 0 and r.seconds_compute > 0
    c = conv_roofline(8192, 128)
    assert c.samples_per_s > 0
