"""Round-5 probe: per-phase cost of the mid-band complex kernel.

The mid-band cfft (N=512..1024-class rows) runs at ~0.55-0.7 of its
serial governing bound while N=4096/B=1024 runs ~1.0 (ROOFLINE.md).
Which phase owns the residual? Build depth-cut kernel twins of
_cfft_tile (same blocks/specs as _pallas_cfft_pair, unordered layout):
  d0 pass-through | d1 +in/out shuffles | d2 +Stockham | d3 full (+merge)
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


def depth_kernel(xre_ref, xim_ref, stw_re_ref, stw_im_ref, dft_re_ref,
                 dft_im_ref, yre_ref, yim_ref, *, n1, radices, depth):
    tb = xre_ref.shape[0]
    xre, xim = xre_ref[...], xim_ref[...]
    if depth == 0:
        yre_ref[...], yim_ref[...] = xre + 1.0, xim + 1.0
        return
    vre = jnp.swapaxes(xre.reshape(tb, n1, LANES), 0, 1)
    vim = jnp.swapaxes(xim.reshape(tb, n1, LANES), 0, 1)
    if depth >= 2:
        vre, vim = pf._stockham_rows(
            vre, vim, radices, stw_re_ref[...], stw_im_ref[...], True)
    if depth >= 3:
        yr, yi = pf._merge_karatsuba(
            vre, vim, dft_re_ref[...], dft_im_ref[...], n1 * tb)
        vre = yr.reshape(n1, tb, LANES)
        vim = yi.reshape(n1, tb, LANES)
    yre_ref[...] = jnp.swapaxes(vre, 0, 1).reshape(tb, n1 * LANES)
    yim_ref[...] = jnp.swapaxes(vim, 0, 1).reshape(tb, n1 * LANES)


def run_depth(xre, xim, n, depth):
    n1 = n // LANES
    radices, (stw_re, stw_im), (dft_re, dft_im) = pf._tables_fwd_folded(n)
    b = xre.shape[0]
    tb = pf._batch_tile(n, b)
    num_stages = stw_re.shape[0]
    kern = functools.partial(depth_kernel, n1=n1, radices=radices, depth=depth)
    batch_spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=[batch_spec, batch_spec,
                  table((num_stages, n1, LANES)), table((num_stages, n1, LANES)),
                  table((LANES, LANES)), table((LANES, LANES))],
        out_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32),
                   jax.ShapeDtypeStruct((b, n), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * b * n, bytes_accessed=16 * b * n, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
    )(xre, xim, jnp.asarray(stw_re), jnp.asarray(stw_im), dft_re, dft_im)


for e in (9, 10, 12):
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    print(f"  N=2^{e} b={b} tb={pf._batch_tile(n, b)} "
          f"(mem floor {16*b*n/819e9*1e6:.1f} us)", flush=True)
    for rep in range(2):
        for depth in (0, 1, 2, 3):
            def mk(d):
                def body(v):
                    r, i = v
                    yr, yi = run_depth(r, i, n, d)
                    return r + yr[:1] * 1e-30, i + yi[:1] * 1e-30
                return body
            t = t_us(mk(depth), (zr, zi))
            print(f"  2^{e} d{depth} rep{rep}: {t:.1f} us", flush=True)

print("DONE", flush=True)
