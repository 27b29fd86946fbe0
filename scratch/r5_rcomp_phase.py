"""Round-5 probe: phase attribution of the REAL composite v2 at 2^18.

The sweep grades rfft fwd 2^18..2^20 at 0.48-0.55 of the (2-trip,
unfloored) real tier — but a structural estimate of the v2 chain
(3 round trips + level compute) is ~200us vs the measured ~335us, so
unlike the complex composite there may be real overhead here. Suspect:
the Hermitian assembly's jnp.flip on the MINOR axis (axis=2 over A/2
lanes) — minor-axis reversals are in the known TPU layout-pathology
class (CLAUDE.md; Mosaic has no rev at all).

Phases timed separately (donated/row carries, min-of-rounds slope,
interleaved): L1 column-blocked real kernel, DC/Nyq line transforms,
L2 v2 kernel, Hermitian assembly (replicated verbatim), full chain.
"""
import functools
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

n = 1 << 18
b = (1 << 22) >> 18  # 16
a, c = pf._split_large(n, real=True)
half_a = a // 2
c2 = c // 2
print(f"N=2^18 b={b} a={a} c={c}", flush=True)

x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
pre0, pim0 = jax.jit(pf._rfft_packed_cols_impl, static_argnums=1)(
    x.reshape(b, a, c), a)
pre0 = jax.device_put(np.asarray(pre0))
pim0 = jax.device_put(np.asarray(pim0))
g0 = jax.device_put(rng.standard_normal((b, c, half_a)).astype(np.float32))
g1 = jax.device_put(rng.standard_normal((b, c, half_a)).astype(np.float32))
lin = jax.device_put(rng.standard_normal((2 * b, c)).astype(np.float32))


def body_full(v):
    r, i = pf._rfft_direct_composite_v2(v[0], n)
    return (v[0] + jnp.concatenate(
        [r[:1, :1], jnp.zeros((1, n - 1), r.dtype)], axis=1) * 1e-30,)


def body_l1(v):
    pre, pim = pf._rfft_packed_cols_impl(v[0].reshape(b, a, c), a)
    return (v[0] + jnp.concatenate(
        [pre[:1, :1, 0], jnp.zeros((1, n - 1), pre.dtype)], axis=1) * 1e-30,)


def body_lines(v):
    lr, li = pf._cfft_pair(v[0], jnp.zeros_like(v[0]), c, pf.FFT_FORWARD, True)
    return (v[0] + lr * 1e-30,)


def body_l2(v):
    pre, pim = v
    rad_c, (stwc_re, stwc_im), (dftc_re, dftc_im) = pf._tables_fwd_folded(c)
    twr, twi = pf._rdc_l2_twiddle(n, True)
    n1c = c // pf.LANES
    ta2 = pf._v2_tile(b, c, half_a)
    k2 = functools.partial(pf._cfft_v2_l2_kernel, n1=n1c, radices=rad_c)
    gr, gi = pf._v2_call(
        k2,
        [pre, pim],
        [
            (twr, (c, ta2), lambda k: (0, k)),
            (twi, (c, ta2), lambda k: (0, k)),
            pf._v2_table(stwc_re), pf._v2_table(stwc_im),
            pf._v2_table(dftc_re), pf._v2_table(dftc_im),
        ],
        half_a // ta2,
        (b, c, ta2), lambda k: (0, 0, k),
        (b, c, ta2), lambda k: (0, 0, k),
        [(b, c, half_a)],
    )
    return gr, gi  # donated


def body_asm(v):
    gr, gi = v
    g0r = gr[:, :, 0]
    g0i = gi[:, :, 0]
    gnyr, gnyi = g0r, g0i  # stand-ins, same shapes
    first_r = jnp.concatenate(
        [g0r[:, :c2, None], gr[:, :c2, 1:], gnyr[:, :c2, None]], axis=2)
    first_i = jnp.concatenate(
        [g0i[:, :c2, None], gi[:, :c2, 1:], gnyi[:, :c2, None]], axis=2)
    sec_r = jnp.flip(jnp.flip(gr[:, c2:, 1:], axis=1), axis=2)
    sec_i = -jnp.flip(jnp.flip(gi[:, c2:, 1:], axis=1), axis=2)
    out_r = jnp.concatenate([first_r, sec_r], axis=2).reshape(b, n // 2)
    out_i = jnp.concatenate([first_i, sec_i], axis=2).reshape(b, n // 2)
    nyq = g0r[:, c2][:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, out_i.shape, 1)
    out_i = jnp.where(col == 0, nyq, out_i)
    return (gr + out_r.reshape(b, c, half_a) * 1e-30,
            gi + out_i.reshape(b, c, half_a) * 1e-30)


def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(ca, _):
            return body(ca), None
        ca, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda t: jnp.sum(t * 0.0), ca)
    return loop


CASES = [
    ("full ", body_full, (x,)),
    ("L1   ", body_l1, (x,)),
    ("lines", body_lines, (lin,)),
    ("L2   ", body_l2, (pre0, pim0)),
    ("asm  ", body_asm, (g0, g1)),
]
pairs = (16, 272)
loops = {}
for name, body, init in CASES:
    loops[name] = [(it, make_loop(body, it)) for it in pairs]
    for _, lp in loops[name]:
        jax.tree_util.tree_map(float, lp(init))
    print(f"  {name} compiled", flush=True)
best = {name: [1e9, 1e9] for name, _, _ in CASES}
for _ in range(4):
    for name, _, init in CASES:
        for j, (_, lp) in enumerate(loops[name]):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, lp(init))
            best[name][j] = min(best[name][j], time.perf_counter() - t0)
lo, hi = pairs
for name, _, _ in CASES:
    t = (best[name][1] - best[name][0]) / (hi - lo) * 1e6
    print(f"{name}: {t:.1f} us", flush=True)
print("DONE", flush=True)
