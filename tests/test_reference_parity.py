"""Differential tests against the actual reference C++ library.

The reference's own test strategy is differential against upstream pffft
(/root/reference/test/test.cpp); ours goes one better and runs differential
against the reference itself: the C++ library is compiled from
/root/reference at test time (SSE path) and driven through ctypes, and the
TPU framework must reproduce its transforms within the reference's C++
bound of 2.0e-7*N (test.cpp:9-14).

Skipped transparently when no C++ toolchain is available.
"""

import ctypes
import pathlib
import subprocess

import numpy as np
import pytest

import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.ops import layout

REF_DIR = pathlib.Path("/root/reference")
LIB_PATH = pathlib.Path("/tmp/chowref_parity/libchowref.so")

FFT_FORWARD, FFT_BACKWARD = 0, 1  # fft_direction_t (chowdsp_fft.h:63-68)
FFT_REAL, FFT_COMPLEX = 0, 1  # fft_transform_t (chowdsp_fft.h:70-75)


def _build() -> ctypes.CDLL | None:
    if not REF_DIR.exists():
        return None
    LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
    if not LIB_PATH.exists():
        try:
            subprocess.run(
                [
                    "g++",
                    "-O2",
                    "-std=c++20",
                    "-fPIC",
                    "-shared",
                    "-msse2",
                    f"-I{REF_DIR}",
                    str(REF_DIR / "chowdsp_fft.cpp"),
                    "-o",
                    str(LIB_PATH),
                ],
                check=True,
                capture_output=True,
                timeout=180,
            )
        except Exception:  # noqa: BLE001
            return None
    lib = ctypes.CDLL(str(LIB_PATH))
    fptr = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.fft_new_setup.restype = ctypes.c_void_p
    lib.fft_new_setup.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_bool]
    lib.fft_destroy_setup.argtypes = [ctypes.c_void_p]
    lib.fft_transform.argtypes = [ctypes.c_void_p, fptr, fptr, fptr, ctypes.c_int]
    lib.fft_transform_unordered.argtypes = list(lib.fft_transform.argtypes)
    lib.fft_convolve_unordered.argtypes = [
        ctypes.c_void_p,
        fptr,
        fptr,
        fptr,
        ctypes.c_float,
    ]
    return lib


@pytest.fixture(scope="module")
def ref():
    lib = _build()
    if lib is None:
        pytest.skip("reference library unavailable (no /root/reference or no g++)")
    return lib


class RefFFT:
    """Minimal RAII driver for the reference C API."""

    def __init__(self, lib, n, kind):
        self.lib, self.n, self.kind = lib, n, kind
        self.setup = lib.fft_new_setup(n, kind, False)
        assert self.setup, f"reference rejected N={n} kind={kind}"
        self.work = np.zeros(2 * n, np.float32)

    def transform(self, buf, direction, unordered=False):
        out = np.zeros_like(buf)
        fn = self.lib.fft_transform_unordered if unordered else self.lib.fft_transform
        fn(self.setup, np.ascontiguousarray(buf), out, self.work, direction)
        return out

    def convolve(self, a, b, scaling):
        ab = np.zeros_like(a)
        self.lib.fft_convolve_unordered(
            self.setup, np.ascontiguousarray(a), np.ascontiguousarray(b), ab, scaling
        )
        return ab

    def __del__(self):
        try:
            self.lib.fft_destroy_setup(self.setup)
        except Exception:  # noqa: BLE001
            pass


def tol(n):
    return 2.0e-7 * n  # test.cpp:11


# Reference size constraints (SSE, w=4): complex N % 16 == 0, real N % 32
# == 0 (chowdsp_fft_impl_common.hpp:165-177).
# 480/960: smooth non-multiples of 128 the reference serves from its SIMD
# tier (N % 16 == 0 complex / N % 32 == 0 real, impl_common.hpp:165-177) —
# ours run the direct-DFT path (480) and the medium composite (960).
COMPLEX_SIZES = [32, 64, 256, 1024, 4096, 480, 960]
REAL_SIZES = [32, 64, 256, 1024, 4096, 96, 480, 960]


@pytest.mark.parametrize("n", COMPLEX_SIZES)
def test_complex_forward_matches_reference(n, ref, rng):
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    buf = np.ascontiguousarray(
        np.stack([z.real, z.imag], -1).reshape(2 * n).astype(np.float32)
    )
    r = RefFFT(ref, n, FFT_COMPLEX)
    ref_out = r.transform(buf, FFT_FORWARD)
    ours = np.asarray(layout.interleave_complex(cf.fft(z)))
    np.testing.assert_allclose(ours, ref_out, atol=tol(n), rtol=0)


@pytest.mark.parametrize("n", COMPLEX_SIZES)
def test_complex_backward_matches_reference(n, ref, rng):
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    buf = np.ascontiguousarray(
        np.stack([z.real, z.imag], -1).reshape(2 * n).astype(np.float32)
    )
    r = RefFFT(ref, n, FFT_COMPLEX)
    ref_out = r.transform(buf, FFT_BACKWARD)
    ours = np.asarray(layout.interleave_complex(cf.ifft(z)))  # both unscaled
    np.testing.assert_allclose(ours, ref_out, atol=tol(n), rtol=0)


@pytest.mark.parametrize("n", REAL_SIZES)
def test_real_forward_matches_reference_packed_layout(n, ref, rng):
    x = rng.standard_normal(n).astype(np.float32)
    r = RefFFT(ref, n, FFT_REAL)
    ref_out = r.transform(x, FFT_FORWARD)  # pffft packed: [DC, Nyq, re, im...]
    ours = np.asarray(layout.to_packed_real_spectrum(cf.rfft(x)))
    np.testing.assert_allclose(ours, ref_out, atol=tol(n), rtol=0)


@pytest.mark.parametrize("n", REAL_SIZES)
def test_real_backward_matches_reference(n, ref, rng):
    x = rng.standard_normal(n).astype(np.float32)
    r = RefFFT(ref, n, FFT_REAL)
    packed = r.transform(x, FFT_FORWARD)
    ref_back = r.transform(packed, FFT_BACKWARD)  # == N * x
    ours = np.asarray(cf.irfft(layout.from_packed_real_spectrum(packed)))
    np.testing.assert_allclose(ours, ref_back, atol=tol(n) * n / 4, rtol=0)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_real_convolution_pipeline_matches_reference(n, ref, rng):
    """Full unordered convolve pipeline, end to end in the time domain —
    internal frequency orders differ by design (backend-private in both
    libraries), so compare after the inverse transform."""
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    scale = np.float32(1.0 / n)
    r = RefFFT(ref, n, FFT_REAL)
    fa = r.transform(a, FFT_FORWARD, unordered=True)
    fb = r.transform(b, FFT_FORWARD, unordered=True)
    fab = r.convolve(fa, fb, scale)
    ref_y = r.transform(fab, FFT_BACKWARD, unordered=True) / n

    A = cf.rfft_unordered(a)
    B = cf.rfft_unordered(b)
    AB = cf.convolve_accumulate(A, B, scaling=scale)
    ours = np.asarray(cf.irfft_unordered(AB)) / n
    np.testing.assert_allclose(ours, ref_y, atol=tol(n) * np.sqrt(n), rtol=0)


def test_reference_rejects_what_we_reject(ref):
    # nullptr for unsupported N (common.hpp:216-225) <-> InvalidSizeError
    assert ref.fft_new_setup(7 * 16, FFT_COMPLEX, False) in (None, 0) or True
    setup = ref.fft_new_setup(112, FFT_COMPLEX, False)  # 7*16: bad factor
    assert not setup
    with pytest.raises(cf.InvalidSizeError):
        cf.make_plan(112, cf.FFT_COMPLEX)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_packed_planes_match_reference_packed_layout(n, ref, rng):
    """The fused fast path's packed SoA planes, interleaved, ARE pffft's
    packed real spectrum — bit-layout parity of the performance path, not
    just the canonical-complex compatibility view."""
    x = rng.standard_normal(n).astype(np.float32)
    r = RefFFT(ref, n, FFT_REAL)
    ref_out = r.transform(x, FFT_FORWARD)  # [DC, Nyq, re1, im1, ...]
    re, im = map(np.asarray, cf.rfft_packed(x))
    ours = np.empty(n, np.float32)
    ours[0] = re[0]
    ours[1] = im[0]  # Nyquist packed into im[0]
    ours[2::2] = re[1:]
    ours[3::2] = im[1:]
    np.testing.assert_allclose(ours, ref_out, atol=tol(n), rtol=0)
