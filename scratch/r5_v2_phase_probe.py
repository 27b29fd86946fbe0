"""Round-5 probe: phase attribution inside the composite v2 (forward).

The 2^18..2^20 rows run at ~0.5 of governing / ~1/3 of memory. Which
kernel owns it? Time level-1 alone (k1 via _v2_call, same tables/blocks
as _cfft_composite_v2) against the full two-kernel chain. Then try the
8 MB block cap (tc=256, half the grid steps) — it OOM'd once on silicon
(NOTES: stack ~15x input block), re-tested here under try/except since
the real-kernel tile refit showed fewer grid steps is the big lever.
"""
import functools
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
LANES = pf.LANES


def t_us(body, init, pair=(8, 136)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def level1_only(xre, xim, n):
    a, c = pf._split_large(n)
    b = xre.shape[0]
    n1a = a // LANES
    tc = pf._v2_tile(b, a, c)
    rad_a, (stwa_re, stwa_im), (dfta_re, dfta_im) = pf._tables_fwd_folded(a)
    k1 = functools.partial(pf._cfft_v2_l1_kernel, n1=n1a, radices=rad_a)
    table = pf._v2_table
    return pf._v2_call(
        k1,
        [xre.reshape(b, a, c), xim.reshape(b, a, c)],
        [table(stwa_re), table(stwa_im), table(dfta_re), table(dfta_im)],
        c // tc,
        (b, a, tc), lambda k: (0, 0, k),
        (b, tc, a), lambda k: (0, k, 0),
        [(b, c, a)],
    )


def level2_only(mid_r, mid_i, n):
    a, c = pf._split_large(n)
    b = mid_r.shape[0]
    n1c = c // LANES
    ta = pf._v2_tile(b, c, a)
    rad_c, (stwc_re, stwc_im), (dftc_re, dftc_im) = pf._tables_fwd_folded(c)
    twr, twi = pf._large_twiddle(n, True, folded=False)
    k2 = functools.partial(pf._cfft_v2_l2_kernel, n1=n1c, radices=rad_c)
    table = pf._v2_table
    return pf._v2_call(
        k2,
        [mid_r, mid_i],
        [
            (twr, (c, ta), lambda k: (0, k)),
            (twi, (c, ta), lambda k: (0, k)),
            table(stwc_re), table(stwc_im), table(dftc_re), table(dftc_im),
        ],
        a // ta,
        (b, c, ta), lambda k: (0, 0, k),
        (b, c, ta), lambda k: (0, 0, k),
        [(b, c, a)],
    )


for e in (18, 20):
    n, b = 1 << e, (1 << 22) >> e
    a, c = pf._split_large(n)
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    print(f"  N=2^{e} b={b}: A={a} C={c} tc={pf._v2_tile(b, a, c)} "
          f"ta={pf._v2_tile(b, c, a)}", flush=True)
    mem_us = 4 * b * n * 4 / 819e9 * 1e6  # one kernel: 2 planes in + 2 out

    def full(v):
        r, i = v
        yr, yi = pf._cfft_composite_v2(r, i, n, True)
        return r + yr[:1] * 1e-30, i + yi[:1] * 1e-30

    def l1(v):
        r, i = v
        mr, mi = level1_only(r, i, n)
        return r + mr[:1].reshape(1, n) * 1e-30, i + mi[:1].reshape(1, n) * 1e-30

    def l2(v):
        r, i = v
        yr, yi = level2_only(r.reshape(b, c, a), i.reshape(b, c, a), n)
        return r + yr[:1].reshape(1, n) * 1e-30, i + yi[:1].reshape(1, n) * 1e-30

    for rep in range(2):
        tf = t_us(full, (zr, zi))
        t1 = t_us(l1, (zr, zi))
        t2 = t_us(l2, (zr, zi))
        print(f"  2^{e} rep{rep}: full {tf:.1f} us, L1 {t1:.1f}, L2 {t2:.1f} "
              f"(L1+L2 {t1+t2:.1f}; per-kernel mem bound {mem_us:.1f})", flush=True)

# 8 MB block retry at 2^18 (tc 128 -> 256, grid steps halve)
n, b = 1 << 18, 16
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
pf._V2_BLOCK_BYTES = 8 << 20
try:
    a, c = pf._split_large(n)
    print(f"  8MB cap: tc={pf._v2_tile(b, a, c)} ta={pf._v2_tile(b, c, a)}", flush=True)

    def full8(v):
        r, i = v
        yr, yi = pf._cfft_composite_v2(r, i, n, True)
        return r + yr[:1] * 1e-30, i + yi[:1] * 1e-30

    for rep in range(2):
        t = t_us(full8, (zr, zi))
        print(f"  2^18 8MB-cap rep{rep}: full {t:.1f} us", flush=True)
except Exception as ex:
    print(f"  2^18 8MB-cap: FAIL {type(ex).__name__}: {str(ex)[:160]}", flush=True)
finally:
    pf._V2_BLOCK_BYTES = 4 << 20

print("DONE", flush=True)
