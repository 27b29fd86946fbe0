"""Round 4: irfft-vs-rfft gap after the Hermitian half-row merge.

Same interleaved methodology as probe C, plus 2^13/2^15 and the
feed-through round-trip for context.
"""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.utils.profiling import op_seconds

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


for e in (12, 13, 15):
    n, b = 1 << e, (1 << 22) >> e
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    re0, im0 = jax.jit(cf.rfft_packed)(x)
    re0 = jax.device_put(np.asarray(re0))
    im0 = jax.device_put(np.asarray(im0))
    # numeric first
    back = np.asarray(jax.jit(cf.irfft_packed)(re0, im0)) / n
    err = np.abs(back - np.asarray(x)).max()
    print(f"  N={n}: irfft numeric err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
    assert err < 2e-7 * n

    def fwd_body(v):
        re, _ = cf.rfft_packed(v)
        return v + re[:, :1] * 1e-30

    def inv_body(v):
        r, i = v
        y = cf.irfft_packed(r, i)
        return r + y[:, :1] * 1e-30, i

    def rt_body(v):
        r, i = cf.rfft_packed(v)
        return cf.irfft_packed(r, i)

    for rep in range(3):
        tf = t_us(fwd_body, x)
        ti = t_us(inv_body, (re0, im0))
        tr = t_us(rt_body, x, pair=(8, 136))
        print(f"  N={n} rep{rep}: rfft {tf:.1f} us, irfft {ti:.1f} us "
              f"(gap {100*(ti-tf)/tf:+.1f}%), rt {tr:.1f} us = "
              f"{b*n/(tr/2):.0f} Ms/s/dir", flush=True)

print("DONE", flush=True)
