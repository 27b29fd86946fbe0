"""Round-5 probe: does the 4-array IO floor drop with fewer grid steps?

Phase probe: d0 pass-through = 140us (62% of the full mid-band cfft) vs
the 82us duplex bound, at 128 grid steps (tb=64) -> ~1.1us/step. The
1-plane round trip (2 arrays) runs at the bound (0.29us/step), and all
joint single-buffer layouts LOSE (r5_joint). Hypothesis: per-grid-step
DMA issue latency scales with array count; fix = bigger blocks (fewer
steps), sub-tiling the compute INSIDE the kernel so Stockham
temporaries stay at sub-tile scale.

Part A: sep4 pass-through, tb in {64, 128, 256, 512, 1024}.
Part B: full cfft kernel (unordered fwd) with block tb_blk and inner
        static loop over 64-row sub-tiles, vs the current monolithic
        tb=64 kernel.
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

LANES = pf.LANES
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def passthrough(arrs, tb):
    k = len(arrs)
    b, n = arrs[0].shape

    def kern(*refs):
        for i_ref, o_ref in zip(refs[:k], refs[k:]):
            o_ref[...] = i_ref[...] + 1.0

    spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[spec] * k,
        out_specs=[spec] * k,
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * k,
        cost_estimate=pl.CostEstimate(
            flops=k * b * n, bytes_accessed=8 * k * b * n, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
    )(*arrs)


b, n = 8192, 512
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

print("--- A: sep4 pass-through tb sweep (64MB moved, duplex bound 82us)",
      flush=True)
for rep in range(2):
    for tb in (64, 128, 256, 512, 1024):
        def body(v, tb=tb):
            r, i = v
            o = passthrough([r, i], tb)
            return r + o[0][:1] * 1e-30, i + o[1][:1] * 1e-30
        t = t_us(body, (zr, zi))
        print(f"  A tb={tb} rep{rep}: {t:.1f} us ({b//tb} steps)", flush=True)


def subtiled_kernel(xre_ref, xim_ref, stw_re_ref, stw_im_ref, dft_re_ref,
                    dft_im_ref, yre_ref, yim_ref, *, n1, radices, sub):
    tb_blk = xre_ref.shape[0]
    for j in range(tb_blk // sub):
        lo = j * sub
        xr = xre_ref[lo:lo + sub, :]
        xi = xim_ref[lo:lo + sub, :]
        vre = jnp.swapaxes(xr.reshape(sub, n1, LANES), 0, 1)
        vim = jnp.swapaxes(xi.reshape(sub, n1, LANES), 0, 1)
        vre, vim = pf._stockham_rows(
            vre, vim, radices, stw_re_ref[...], stw_im_ref[...], True)
        yr, yi = pf._merge_karatsuba(
            vre, vim, dft_re_ref[...], dft_im_ref[...], n1 * sub)
        vre = yr.reshape(n1, sub, LANES)
        vim = yi.reshape(n1, sub, LANES)
        yre_ref[lo:lo + sub, :] = jnp.swapaxes(vre, 0, 1).reshape(sub, n1 * LANES)
        yim_ref[lo:lo + sub, :] = jnp.swapaxes(vim, 0, 1).reshape(sub, n1 * LANES)


def run_subtiled(xre, xim, n, tb_blk, sub):
    n1 = n // LANES
    radices, (stw_re, stw_im), (dft_re, dft_im) = pf._tables_fwd_folded(n)
    bb = xre.shape[0]
    num_stages = stw_re.shape[0]
    kern = functools.partial(subtiled_kernel, n1=n1, radices=radices, sub=sub)
    batch_spec = pl.BlockSpec((tb_blk, n), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(bb // tb_blk,),
        in_specs=[batch_spec, batch_spec,
                  table((num_stages, n1, LANES)), table((num_stages, n1, LANES)),
                  table((LANES, LANES)), table((LANES, LANES))],
        out_specs=[batch_spec, batch_spec],
        out_shape=[jax.ShapeDtypeStruct((bb, n), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=16 * bb * n, bytes_accessed=16 * bb * n, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
    )(xre, xim, jnp.asarray(stw_re), jnp.asarray(stw_im), dft_re, dft_im)


print("--- B: full fwd kernel, sub-tiled big blocks vs monolithic tb=64",
      flush=True)
# numeric check once (against the existing pair, unordered layout match)
ref_r, ref_i = jax.jit(
    lambda r, i: pf._pallas_cfft_pair(r, i, n, True, False))(zr[:256], zi[:256])
got_r, got_i = jax.jit(
    lambda r, i: run_subtiled(r, i, n, 256, 64))(zr[:256], zi[:256])
err = max(float(jnp.max(jnp.abs(ref_r - got_r))),
          float(jnp.max(jnp.abs(ref_i - got_i))))
print(f"  B numeric vs current kernel: max abs err {err:.3e}", flush=True)

for rep in range(2):
    for tb_blk, sub in ((64, 64), (256, 64), (512, 64), (1024, 64),
                        (512, 128)):
        def body(v, tb_blk=tb_blk, sub=sub):
            r, i = v
            yr, yi = run_subtiled(r, i, n, tb_blk, sub)
            return r + yr[:1] * 1e-30, i + yi[:1] * 1e-30
        try:
            t = t_us(body, (zr, zi))
            print(f"  B tb_blk={tb_blk} sub={sub} rep{rep}: {t:.1f} us "
                  f"({b//tb_blk} steps)", flush=True)
        except Exception as ex:
            print(f"  B tb_blk={tb_blk} sub={sub} rep{rep}: FAIL "
                  f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)

print("DONE", flush=True)
