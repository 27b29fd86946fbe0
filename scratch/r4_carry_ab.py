"""Round 4: carry-construction A/B for the fwd-only measurement bodies.

The sweep/bench fwd bodies use `v + out[:, :1] * 1e-30` — a (B, 1)
column slice broadcast against (B, N). At the sweep's tall-skinny end
(N=32, B=131072) the fwd numbers run ~6x slower than the same
transform inside an rt chain, which smells like the known
(B,1)->(B,N) broadcast pathology, not kernel cost. Variants:
  col:  v + out[:, :1] * 1e-30      (current)
  row:  v + out[:1, :] * 1e-30      ((1, N) broadcast down B)
  full: v + out * 1e-30             (full-output feed, op_seconds form)
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


import jax.numpy as jnp  # noqa: E402


for e in (5, 8, 12):
    n, b = 1 << e, (1 << 22) >> e
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def col(v):
        re, _ = cf.rfft_packed(v)
        return v + re[:, :1] * 1e-30

    def row(v):
        re, _ = cf.rfft_packed(v)
        pad = jnp.zeros((1, n - re.shape[1]), re.dtype)
        return v + jnp.concatenate([re[:1], pad], axis=1) * 1e-30

    def full(v):
        re, im = cf.rfft_packed(v)
        return v + jnp.concatenate([re, im], axis=1) * 1e-30

    for rep in range(2):
        for name, body in (("col", col), ("row", row), ("full", full)):
            t = t_us(body, x)
            print(f"  rfft 2^{e} {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)

    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def ccol(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return r + sr[:, :1] * 1e-30, i + si[:, :1] * 1e-30

    def crow(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return r + sr[:1, :] * 1e-30, i + si[:1, :] * 1e-30

    def cfull(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return r + sr * 1e-30, i + si * 1e-30

    for rep in range(2):
        for name, body in (("col", ccol), ("row", crow), ("full", cfull)):
            t = t_us(body, (zr, zi))
            print(f"  cfft 2^{e} {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)

print("DONE", flush=True)
