"""Round-5 probe D2: where does the pass-through aliasing win go?

r5_alias_ab found: dead-input fwd +15-20%, live-input -25% (defensive
copy), rt chain ~tie — far from the 2.2x pass-through. Two suspected
harness/structure effects:
  1. the dead-case epilogue multiply (fr*scale) added a 2-plane pass;
  2. chains may lose cross-kernel pipelining when aliased.
This probe measures the RAW dead case (carry = kernel outputs, no
epilogue — values diverge but timing is value-independent), dumps HLO
copy counts to confirm donation actually happens, and A/Bs the
composite-v2 2^18 chain (the real target of VERDICT task 3).
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import chowdsp_fft_tpu as cf  # noqa: F401
from chowdsp_fft_tpu.ops import pallas_fft as pf

pf._ALIAS_KERNELS = False  # keep production calls un-aliased as baseline

LANES = pf.LANES
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def cfft_pair_alias(xre, xim, n, forward, reverse_order, ordered_io=False):
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


def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop


def copy_count(body, init):
    """Count copy/copy-start instructions in the optimized TPU HLO of the
    16-iter loop — a direct check whether donation removed the defensive
    copies."""
    lp = make_loop(body, 16)
    try:
        txt = lp.lower(init).compile().as_text()
    except Exception as ex:  # noqa: BLE001
        return f"HLO unavailable: {type(ex).__name__}"
    return sum(1 for ln in txt.splitlines() if " copy(" in ln or " copy-start(" in ln)


def run_cases(tag, cases, init, pairs=(16, 272), rounds=4, per_dir=1):
    loops = {}
    for name, body in cases:
        loops[name] = [(it, make_loop(body, it)) for it in pairs]
        for _, lp in loops[name]:
            jax.tree_util.tree_map(float, lp(init))
        print(f"  {tag} {name} compiled", flush=True)
    best = {name: [float("inf")] * 2 for name, _ in cases}
    for rep in range(rounds):
        for name, _ in cases:
            for j, (it, lp) in enumerate(loops[name]):
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


# --- Part 1: raw dead-input carry (carry IS the kernel output) ---------
for e in (9, 12):
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def cur_raw(v):
        return pf._pallas_cfft_pair(v[0], v[1], n, True, False)

    def ali_raw(v):
        return cfft_pair_alias(v[0], v[1], n, True, False)

    print(f"2^{e} copy-count cur_raw: {copy_count(cur_raw, (zr, zi))} "
          f"ali_raw: {copy_count(ali_raw, (zr, zi))}", flush=True)
    run_cases(f"2^{e} raw-dead", [("cur", cur_raw), ("ali", ali_raw)], (zr, zi))

# --- Part 2: composite-v2 2^18 chain (production alias switch) ---------
n = 1 << 18
b = (1 << 22) >> 18  # 16
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))


def comp_fwd(v):
    return pf._cfft_composite_v2_batched(v[0], v[1], n, True)


def comp_rt(v):
    fr, fi = pf._cfft_composite_v2_batched(v[0], v[1], n, True)
    gr, gi = pf._cfft_composite_v2_batched(fr, fi, n, False)
    return gr * (1.0 / n), gi * (1.0 / n)


for alias_on in (False, True):
    pf._ALIAS_KERNELS = alias_on
    tagg = "ali" if alias_on else "cur"
    run_cases(f"2^18 comp {tagg}", [("fwd", comp_fwd), ("rt", comp_rt)],
              (zr, zi), pairs=(8, 72))

# numerics with alias on
pf._ALIAS_KERNELS = True
fr, fi = jax.jit(comp_fwd)((zr[:2], zi[:2]))
ref = np.fft.fft(np.asarray(zr[:2]).astype(np.float64)
                 + 1j * np.asarray(zi[:2]).astype(np.float64), axis=1)
err = max(float(jnp.max(jnp.abs(fr - ref.real))),
          float(jnp.max(jnp.abs(fi - ref.imag))))
print(f"2^18 aliased composite numeric err vs f64: {err:.3e} "
      f"(tol {2e-7 * n:.3e})", flush=True)
print("DONE", flush=True)
