"""Round-5 probe (VERDICT r4 task 7): small-N complex 2^5/2^6 at
0.68-0.73 of governing while real rt at the same sizes is at/over bound.

Two candidate levers, A/B'd on chip against the shipping 4-matmul kernel:
  1. input_output_aliases (now wired behind pf._ALIAS_KERNELS): at
     b*n = 2^22 the 2in+2out fp32 footprint is 64 MB live > the ~32 MB
     fast window, so the un-aliased form pays the measured IO floor.
  2. stacked-K 2x-column matmul: [ar | ai] @ [[Wr, Wi], [-Wi, Wr]] is ONE
     (tb, 2gN) @ (2gN, 2gN) matmul = 2 K=128 pass-chunks x 6 fp32 passes
     per row-tile, vs the schoolbook's 4 matmuls x 6 = 4 chunk-passes —
     half the MXU time, identical sums (no accuracy cost, unlike
     Karatsuba). Same trick as _small_irfft_kernel's stacked-K form.

Timing per skills/verify: jitted lax.scan slope between two loop lengths,
min-of-rounds, cases interleaved in one process. Numerics: every variant
checked against numpy f64 at 2e-7*N before timing.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import chowdsp_fft_tpu as cf  # noqa: F401,E402
from chowdsp_fft_tpu.ops import pallas_fft as pf  # noqa: E402

LANES = pf.LANES
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


@functools.lru_cache(maxsize=16)
def _stacked_tables_c(n: int, forward: bool):
    """(2gN, 2gN) = [[Wr, Wi], [-Wi, Wr]] from the shipping f64 tables."""
    wr, wi = pf._small_tables_c(n, forward)
    top = np.concatenate([wr, wi], axis=1)
    bot = np.concatenate([-wi, wr], axis=1)
    return np.concatenate([top, bot], axis=0)


def _stacked_cfft_kernel(xre_ref, xim_ref, w_ref, yre_ref, yim_ref):
    m = yre_ref.shape[-1]
    out = pf._merge_dot(
        jnp.concatenate([xre_ref[...], xim_ref[...]], axis=-1), w_ref[...]
    )
    yre_ref[...] = out[:, :m]
    yim_ref[...] = out[:, m:]


def stacked_cfft_pair(xre, xim, n, forward):
    g = pf._small_g(n)
    w = _stacked_tables_c(n, forward)
    pr, b = pf._small_pack(xre, g)
    pi, _ = pf._small_pack(xim, g)
    yr, yi = pf._small_call(_stacked_cfft_kernel, [pr, pi], [w], g * n, 2)
    return yr.reshape(-1, n)[:b], yi.reshape(-1, n)[:b]


def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop


def run_cases(tag, cases, init, pairs=(16, 272), rounds=4):
    loops = {}
    for name, body in cases:
        loops[name] = [(it, make_loop(body, it)) for it in pairs]
        for _, lp in loops[name]:
            jax.tree_util.tree_map(float, lp(init))
        print(f"  {tag} {name} compiled", flush=True)
    best = {name: [float("inf")] * 2 for name, _ in cases}
    for _ in range(rounds):
        for name, _ in cases:
            for j, (_, lp) in enumerate(loops[name]):
                t0 = time.perf_counter()
                jax.tree_util.tree_map(float, lp(init))
                best[name][j] = min(best[name][j], time.perf_counter() - t0)
    lo, hi = pairs
    out = {}
    for name, _ in cases:
        t = (best[name][1] - best[name][0]) / (hi - lo) * 1e6
        out[name] = t
        print(f"  {tag} {name}: {t:.1f} us", flush=True)
    return out


# --- numeric check: stacked kernel vs numpy f64 (both directions) -------
for n in (32, 64):
    b = 512
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    for fwd in (True, False):
        yr, yi = jax.jit(stacked_cfft_pair, static_argnums=(2, 3))(
            jnp.asarray(xr), jnp.asarray(xi), n, fwd)
        z = xr.astype(np.float64) + 1j * xi.astype(np.float64)
        ref = np.fft.fft(z, axis=1) if fwd else np.fft.ifft(z, axis=1) * n
        err = max(float(jnp.max(jnp.abs(yr - ref.real))),
                  float(jnp.max(jnp.abs(yi - ref.imag))))
        print(f"stacked N={n} fwd={fwd} err {err:.3e} (tol {2e-7*n:.3e})",
              flush=True)
        assert err < 2e-7 * n

# --- timing A/B ---------------------------------------------------------
for e in (5, 6):
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def cur4(v, n=n):  # shipping 4-matmul kernel, alias per module switch
        return pf._small_cfft_pair(v[0], v[1], n, True)

    def stk(v, n=n):  # stacked-K 2-chunk kernel
        return stacked_cfft_pair(v[0], v[1], n, True)

    for alias_on in (True, False):
        pf._ALIAS_KERNELS = alias_on
        tag = f"2^{e} alias={'ON ' if alias_on else 'OFF'}"
        res = run_cases(tag, [("cur4", cur4), ("stk ", stk)], (zr, zi))
        for name, t in res.items():
            print(f"  {tag} {name}: {b*n/t:.0f} Ms/s fwd", flush=True)
    pf._ALIAS_KERNELS = True

# governing bound context
from chowdsp_fft_tpu.utils.roofline import fft_roofline  # noqa: E402
for e in (5, 6):
    n, b = 1 << e, (1 << 22) >> e
    r = fft_roofline(n, b, "complex")
    print(f"2^{e} governing {b*n/r.seconds_serial/1e6:.0f} Ms/s "
          f"mem {b*n/r.seconds_memory/1e6:.0f} Ms/s", flush=True)
print("DONE", flush=True)
