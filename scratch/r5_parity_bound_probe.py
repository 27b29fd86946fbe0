import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import test_reference_parity as tp
import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.ops import layout

lib = tp._build()
assert lib

def stats(name, ours, refv, exact, n):
    t = tp.tol(n)
    print(f"{name}: ours-vs-exact {np.abs(ours-exact).max():.3e}  "
          f"ref-vs-exact {np.abs(refv-exact).max():.3e}  "
          f"ours-vs-ref {np.abs(ours-refv).max():.3e}  tol {t:.3e}  "
          f"max|exact| {np.abs(exact).max():.3e}  n={n}")

# forward complex at 4096, 9216 (sine signal)
for n in (4096, 9216):
    buf = tp._sine_complex(n)
    z = (buf[0::2] + 1j*buf[1::2]).astype(np.complex64)
    r = tp.RefFFT(lib, n, tp.FFT_COMPLEX)
    ref_fwd = r.transform(buf, tp.FFT_FORWARD)
    ours_fwd = np.asarray(layout.interleave_complex(cf.fft(z)))
    ex = np.fft.fft(buf[0::2].astype(np.float64) + 1j*buf[1::2].astype(np.float64))
    exact = np.empty(2*n); exact[0::2] = ex.real; exact[1::2] = ex.imag
    stats(f"cfwd {n}", ours_fwd, ref_fwd, exact, n)

# complex convolution at 32..512
for n in (32, 64, 128, 256, 512):
    buf1, buf2 = tp._sine_complex(n), tp._sine_complex(n)
    i = np.arange(n, dtype=np.float32)
    buf2[0::2] = tp._sine_real(n, 200.0)
    buf2[1::2] = np.cos(3.14*(200.0/48000.0)*i)
    scale = np.float32(1.0/n)
    r = tp.RefFFT(lib, n, tp.FFT_COMPLEX)
    fa = r.transform(buf1, tp.FFT_FORWARD, unordered=True)
    fb = r.transform(buf2, tp.FFT_FORWARD, unordered=True)
    fab = r.convolve(fa, fb, scale)
    ref_y = r.transform(fab, tp.FFT_BACKWARD, unordered=True)
    z1 = (buf1[0::2]+1j*buf1[1::2]).astype(np.complex64)
    z2 = (buf2[0::2]+1j*buf2[1::2]).astype(np.complex64)
    A, B = cf.fft_unordered(z1), cf.fft_unordered(z2)
    ours_y = np.asarray(layout.interleave_complex(cf.ifft_unordered(A*B*scale)))
    za = buf1[0::2].astype(np.float64)+1j*buf1[1::2].astype(np.float64)
    zb = buf2[0::2].astype(np.float64)+1j*buf2[1::2].astype(np.float64)
    ey = np.fft.ifft(np.fft.fft(za)*np.fft.fft(zb))  # ifft has 1/n = scale, bwd unscaled *n
    exact = np.empty(2*n); exact[0::2] = ey.real; exact[1::2] = ey.imag
    stats(f"cconv {n}", ours_y, ref_y, exact, n)

# real convolution 128..512
for n in (128, 256, 512):
    a, b = tp._sine_real(n, 100.0), tp._sine_real(n, 200.0)
    scale = np.float32(1.0/n)
    r = tp.RefFFT(lib, n, tp.FFT_REAL)
    fa = r.transform(a, tp.FFT_FORWARD, unordered=True)
    fb = r.transform(b, tp.FFT_FORWARD, unordered=True)
    fab = r.convolve(fa, fb, scale)
    ref_y = r.transform(fab, tp.FFT_BACKWARD, unordered=True)
    A, B = cf.rfft_unordered(a), cf.rfft_unordered(b)
    AB = cf.convolve_accumulate(A, B, scaling=scale)
    ours_y = np.asarray(cf.irfft_unordered(AB))
    exact = np.fft.irfft(np.fft.rfft(a.astype(np.float64))*np.fft.rfft(b.astype(np.float64)))
    stats(f"rconv {n}", ours_y, ref_y, exact, n)
