"""Round-5 probe D: input_output_aliases on the real cfft kernels.

r5_stream_probe: an aliased 2in+2out pass-through runs 65-68us/64MB —
full duplex, 2.2x the un-aliased 140us floor (footprint theory: <=32MB
total HBM footprint runs at bound; the alias halves the footprint).
Measure the FULL mid-band kernel with aliasing:
  - fwd, dead input (scan carry replaced)      [the chain case]
  - fwd, live input (carry keeps x; XLA must defensively copy)
  - roundtrip fwd+inv both aliased
at N=2^9 and 2^12, vs the current un-aliased kernel. Plus numerics.
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import chowdsp_fft_tpu as cf  # noqa: F401
from chowdsp_fft_tpu.ops import pallas_fft as pf
from chowdsp_fft_tpu.utils.profiling import op_seconds

# The production kernels now carry input_output_aliases behind this switch
# (round-5 wiring); force it OFF so the "cur" baselines here stay the
# un-aliased round-4 form and the A/B stays meaningful.
pf._ALIAS_KERNELS = False

LANES = pf.LANES
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def cfft_pair_alias(xre, xim, n, forward, reverse_order, ordered_io=False):
    """_pallas_cfft_pair with input_output_aliases={0:0, 1:1}."""
    n1 = n // LANES
    if not reverse_order:
        radices, (stw_re, stw_im), (dft_re, dft_im) = pf._tables_fwd_folded(n)
        mtw_re = np.ones((n1, LANES), np.float32)
        mtw_im = np.zeros((n1, LANES), np.float32)
    else:
        radices, (stw_re, stw_im), (mtw_re, mtw_im), (dft_re, dft_im) = \
            pf._tables(n, forward)
    b = xre.shape[0]
    tb = pf._batch_tile(n, b)
    assert b % tb == 0
    num_stages = stw_re.shape[0]
    kern = functools.partial(
        pf._fft_kernel, n1=n1, radices=radices, sign_fwd=forward,
        reverse_order=reverse_order, ordered_io=ordered_io)
    batch_spec = pl.BlockSpec((tb, n), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[batch_spec, batch_spec,
                  table((num_stages, n1, LANES)), table((num_stages, n1, LANES)),
                  table((n1, LANES)), table((n1, LANES)),
                  table((LANES, LANES)), table((LANES, LANES))],
        out_specs=[batch_spec, batch_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
        input_output_aliases={0: 0, 1: 1},
        cost_estimate=pl.CostEstimate(
            flops=16 * b * n, bytes_accessed=16 * b * n, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
    )(xre, xim, jnp.asarray(stw_re), jnp.asarray(stw_im),
      jnp.asarray(mtw_re), jnp.asarray(mtw_im), dft_re, dft_im)


for e in (9, 12):
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    # numerics: aliased unordered fwd vs current kernel
    ar, ai = jax.jit(lambda r, i: cfft_pair_alias(r, i, n, True, False))(
        zr[:64], zi[:64])
    br, bi = jax.jit(lambda r, i: pf._pallas_cfft_pair(r, i, n, True, False))(
        zr[:64], zi[:64])
    err = max(float(jnp.max(jnp.abs(ar - br))), float(jnp.max(jnp.abs(ai - bi))))
    print(f"N=2^{e} aliased-vs-current numeric err: {err:.3e}", flush=True)

    def cur_fwd(v):
        r, i = v
        fr, fi = pf._pallas_cfft_pair(r, i, n, True, False)
        return r + fr[:1] * 1e-30, i + fi[:1] * 1e-30

    scale = float(n) ** -0.5  # Parseval: fwd multiplies energy by n exactly

    def ali_fwd_dead(v):  # carry = scaled output ONLY: the input dies, XLA
        r, i = v          # may truly donate it (the chain/scan-carry regime)
        fr, fi = cfft_pair_alias(r, i, n, True, False)
        return fr * scale, fi * scale

    def cur_fwd_dead(v):  # un-aliased twin of the dead-input body
        r, i = v
        fr, fi = pf._pallas_cfft_pair(r, i, n, True, False)
        return fr * scale, fi * scale

    def ali_fwd_chain(v):  # true chain: carry IS the output (bounded via inv)
        r, i = v
        fr, fi = cfft_pair_alias(r, i, n, True, False)
        gr, gi = cfft_pair_alias(fr, fi, n, False, True)  # inverse, unscaled
        return gr * (1.0 / n), gi * (1.0 / n)

    def cur_chain(v):
        r, i = v
        fr, fi = pf._pallas_cfft_pair(r, i, n, True, False)
        gr, gi = pf._pallas_cfft_pair(fr, fi, n, False, True)
        return gr * (1.0 / n), gi * (1.0 / n)

    def ali_fwd_live(v):  # input stays in the carry: XLA defensive copy
        r, i = v
        fr, fi = cfft_pair_alias(r, i, n, True, False)
        return r + fr[:1] * 1e-30, i + fi[:1] * 1e-30

    CASES = [
        ("cur fwd (live in)", cur_fwd, (16, 272)),
        ("ali fwd live     ", ali_fwd_live, (16, 272)),
        ("cur fwd dead     ", cur_fwd_dead, (16, 272)),
        ("ali fwd dead     ", ali_fwd_dead, (16, 272)),
        ("cur rt chain     ", cur_chain, (8, 136)),
        ("ali rt chain     ", ali_fwd_chain, (8, 136)),
    ]

    # Compile each scan loop ONCE (the tunnel is in its slow-compile state,
    # ~65s/kernel — round-3/4 "transient blowup"), then interleave timing
    # rounds over the cached jits, min-of-rounds slope per case.
    import time as _time

    def make_loop(body, iters):
        @jax.jit
        def loop(v):
            def step(c, _):
                return body(c), None
            c, _ = jax.lax.scan(step, v, None, length=iters)
            return jax.tree_util.tree_map(lambda a: a.sum(), c)
        return loop

    loops = {}
    for name, body, pair in CASES:
        loops[name] = [(it, make_loop(body, it)) for it in pair]
        for _, lp in loops[name]:
            jax.tree_util.tree_map(float, lp((zr, zi)))  # compile + warm
        print(f"  2^{e} {name} compiled", flush=True)

    best = {name: [float("inf")] * 2 for name, _, _ in CASES}
    for rep in range(4):
        for name, _, pair in CASES:
            for j, (it, lp) in enumerate(loops[name]):
                t0 = _time.perf_counter()
                jax.tree_util.tree_map(float, lp((zr, zi)))
                best[name][j] = min(best[name][j], _time.perf_counter() - t0)
        for name, _, pair in CASES:
            lo, hi = pair
            t = (best[name][1] - best[name][0]) / (hi - lo) * 1e6
            per = t / (2 if "rt" in name else 1)
            print(f"  2^{e} {name} round{rep}: {t:.1f} us = "
                  f"{b*n/per:.0f} Ms/s/dir", flush=True)

print("DONE", flush=True)
