"""Round 4: in-kernel ordered cfft IO vs the XLA digit-transpose pass.

Measures the ORDERED fwd-only basis (where probe D saw ~150us of
transpose) and the ORDERED round-trip basis (where the XLA transposes
cancel, so in-kernel transposes are pure added cost) at several N.
"""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.ops import pallas_fft as pf
from chowdsp_fft_tpu.utils.profiling import op_seconds

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def cfwd(v):
    r, i = v
    sr, si = cf.fft_planes(r, i)
    return r + sr[:, :1] * 1e-30, i + si[:, :1] * 1e-30


def crt(v):
    r, i = v
    sr, si = cf.fft_planes(r, i)
    return cf.ifft_planes(sr, si)


# numeric spot check on silicon first (N=4096)
n, b = 4096, 8
xr = rng.standard_normal((b, n)).astype(np.float32)
xi = rng.standard_normal((b, n)).astype(np.float32)
ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64), axis=-1)
pf._ORDERED_IN_KERNEL_MAX_N1 = 10**9
sr, si = jax.jit(cf.fft_planes)(xr, xi)
err = max(np.abs(np.asarray(sr) - ref.real).max(),
          np.abs(np.asarray(si) - ref.imag).max())
print(f"numeric on silicon N={n}: err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
assert err < 2e-7 * n

for e in (12, 13, 15):
    n = 1 << e
    b = (1 << 22) >> e
    ar = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    ai = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    for rep in range(3):
        row = {}
        for name, flag in (("inkernel", True), ("xla", False)):
            pf._ORDERED_IN_KERNEL_MAX_N1 = 10**9 if flag else None
            tf = t_us(lambda v: cfwd(v), (ar, ai))
            tr = t_us(lambda v: crt(v), (ar, ai), pair=(8, 136))
            row[name] = (tf, tr)
            print(f"  2^{e} {name} rep{rep}: fwd {tf:.1f} us = "
                  f"{b*n/tf:.0f} Ms/s, rt {tr:.1f} us = "
                  f"{b*n/(tr/2):.0f} Ms/s/dir", flush=True)

pf._ORDERED_IN_KERNEL_MAX_N1 = 32
print("DONE", flush=True)
