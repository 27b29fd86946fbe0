"""Round-5 probe: re-measure the in-kernel ordered-IO gate
(_ORDERED_IN_KERNEL_MAX_N1 = 32) with input_output_aliases live.

r5_ord_alias_ab attribution: at n1 > 32 the ordered fwd pays an external
_digit_transpose = one extra HBM round trip (+154us at 2^13, +70us at
2^15) on top of an aliased kernel that now runs at 182/209us — the
round-4 gate (in-kernel ordered loses above n1=32) was measured against
a 40% slower un-aliased kernel, so the ratio has moved. A/B: ordered
fwd with in-kernel ordered IO forced ON vs the shipping external form,
alias ON everywhere, n1 = 64 / 128 / 256 (2^13 / 2^14 / 2^15).
Numerics checked per variant before timing.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf  # noqa: F401,E402
from chowdsp_fft_tpu.ops import pallas_fft as pf  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop


for e in (13, 14, 15):
    n, b = 1 << e, (1 << 22) >> e
    xr = rng.standard_normal((4, n)).astype(np.float32)
    xi = rng.standard_normal((4, n)).astype(np.float32)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64), axis=1)

    # numeric check of the forced in-kernel ordered form
    pf._ORDERED_IN_KERNEL_MAX_N1 = 1 << 20  # force in-kernel ordered IO
    if pf._ordered_in_kernel(n):
        yr, yi = jax.jit(pf._cfft_pair_impl, static_argnums=(2, 3, 4))(
            jnp.asarray(xr), jnp.asarray(xi), n, pf.FFT_FORWARD, True)
        err = max(float(jnp.max(jnp.abs(yr - ref.real))),
                  float(jnp.max(jnp.abs(yi - ref.imag))))
        print(f"2^{e} in-kernel ordered err {err:.3e} (tol {2e-7*n:.3e})",
              flush=True)
        assert err < 2e-7 * n
    else:
        print(f"2^{e} in-kernel ordered NOT AVAILABLE (gate)", flush=True)
        pf._ORDERED_IN_KERNEL_MAX_N1 = 32
        continue

    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    pairs = (16, 272)

    cases = {}
    for ik in (True, False):
        pf._ORDERED_IN_KERNEL_MAX_N1 = (1 << 20) if ik else 32
        tag = "inkern" if ik else "extern"

        def body(v, n=n):
            return pf._cfft_pair_impl(v[0], v[1], n, pf.FFT_FORWARD, True)

        lps = [(it, make_loop(body, it)) for it in pairs]
        for _, lp in lps:
            jax.tree_util.tree_map(float, lp((zr, zi)))
        cases[tag] = lps
        print(f"  2^{e} {tag} compiled", flush=True)
    pf._ORDERED_IN_KERNEL_MAX_N1 = 32

    best = {k: [float("inf")] * 2 for k in cases}
    for _ in range(4):
        for k, lps in cases.items():
            for j, (_, lp) in enumerate(lps):
                t0 = time.perf_counter()
                jax.tree_util.tree_map(float, lp((zr, zi)))
                best[k][j] = min(best[k][j], time.perf_counter() - t0)
    lo, hi = pairs
    for k in cases:
        t = (best[k][1] - best[k][0]) / (hi - lo) * 1e6
        print(f"2^{e} ord {k}: {t:.1f} us = {b*n/t:.0f} Ms/s fwd", flush=True)
print("DONE", flush=True)
