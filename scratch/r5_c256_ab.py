"""Round-5 A/B: cfft N=256 — small direct-DFT (current dispatch, 4
schoolbook (256,256) matmuls = 96 row-pass-units/tb) vs the n1=2
Stockham kernel (3 Karatsuba (128,128) merges on 2tb rows = 36/tb).
Also: direct with Karatsuba (3 matmuls = 72/tb) as the middle variant,
relevant to the 160..511 smooth non-multiples that have no kernel.
Ordered basis (fft_planes semantics; kernel takes the in-kernel ordered
form, n1=2 <= 32).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf  # noqa: F401
from chowdsp_fft_tpu.ops import pallas_fft as pf
from chowdsp_fft_tpu.utils.profiling import op_seconds

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


n = 256
b = (1 << 22) >> 8
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

# numeric sanity: kernel (ordered) vs numpy
zs = (np.asarray(zr[:64]) + 1j * np.asarray(zi[:64])).astype(np.complex128)
ref = np.fft.fft(zs, axis=1)
kr, ki = jax.jit(lambda r, i: pf._pallas_cfft_pair(
    r, i, n, forward=True, reverse_order=False, ordered_io=True))(zr[:64], zi[:64])
err = max(float(np.max(np.abs(np.asarray(kr) - ref.real))),
          float(np.max(np.abs(np.asarray(ki) - ref.imag))))
print(f"kernel ordered numeric err vs numpy f64: {err:.3e} "
      f"(bound {2e-7*n:.2e})", flush=True)

dr, di = jax.jit(lambda r, i: pf._small_cfft_pair(r, i, n, True))(zr[:64], zi[:64])
errd = max(float(np.max(np.abs(np.asarray(dr) - ref.real))),
           float(np.max(np.abs(np.asarray(di) - ref.imag))))
print(f"direct numeric err vs numpy f64: {errd:.3e}", flush=True)


def small(v):
    r, i = v
    fr, fi = pf._small_cfft_pair(r, i, n, True)
    return r + fr[:1] * 1e-30, i + fi[:1] * 1e-30


def kernel_ord(v):
    r, i = v
    fr, fi = pf._pallas_cfft_pair(r, i, n, forward=True,
                                  reverse_order=False, ordered_io=True)
    return r + fr[:1] * 1e-30, i + fi[:1] * 1e-30


def kernel_unord(v):
    r, i = v
    fr, fi = pf._pallas_cfft_pair(r, i, n, forward=True,
                                  reverse_order=False, ordered_io=False)
    return r + fr[:1] * 1e-30, i + fi[:1] * 1e-30


def kernel_rt(v):
    r, i = v
    fr, fi = pf._pallas_cfft_pair(r, i, n, forward=True,
                                  reverse_order=False, ordered_io=True)
    return pf._pallas_cfft_pair(fr, fi, n, forward=False,
                                reverse_order=True, ordered_io=True)


def small_rt(v):
    r, i = v
    fr, fi = pf._small_cfft_pair(r, i, n, True)
    return pf._small_cfft_pair(fr, fi, n, False)


CASES = [
    ("direct fwd   ", small, (16, 272)),
    ("kernel fwd ord", kernel_ord, (16, 272)),
    ("kernel fwd uno", kernel_unord, (16, 272)),
    ("direct rt    ", small_rt, (8, 136)),
    ("kernel rt ord", kernel_rt, (8, 136)),
]
for rep in range(3):
    for name, body, pair in CASES:
        t = t_us(body, (zr, zi), pair=pair)
        per_dir = t / (2 if "rt" in name else 1)
        print(f"  {name} rep{rep}: {t:.1f} us = {b*n/per_dir:.0f} Ms/s"
              f"{'/dir' if 'rt' in name else ''}", flush=True)

print("DONE", flush=True)
