"""Round-5 probe C: can the 2-plane IO floor be beaten at all?

Facts so far (r5_io_floor/joint/bigblock): 1in+1out 16MB = at duplex
bound (36.6us/32MB); any 2in+2out = ~1.7x over bound (128-153us/64MB);
joint single-buffer layouts, bigger blocks, and sub-tiling all lose.
Remaining candidates:
  alias : 2in+2out with input_output_aliases (in-place pages)
  seq2  : two data-dependent 1in+1out calls in one jit (re then im)
  par2  : two independent 1in+1out calls in one jit (XLA may overlap)
  r1w2  : 1 full in + 2 half outs (the fused-rfft IO shape; round-2
          notes claim ~27-33us for 32MB)
  r2w2h : 2 half in + 2 half out (32MB total: is the 4-stream floor
          byte-proportional? matters for the roofline model)
"""
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

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def copy_call(arrs, out_shapes, tb, aliases=None):
    """Pass-through-ish call: outputs tile-sliced copies of inputs.
    out_shapes rows must evenly split/merge the input rows."""
    k = len(arrs)
    b, n = arrs[0].shape

    def kern(*refs):
        ins, outs = refs[:k], refs[k:]
        if len(outs) == len(ins):
            for i_ref, o_ref in zip(ins, outs):
                o_ref[...] = i_ref[...] + 1.0
        elif len(ins) == 1 and len(outs) == 2:
            x = ins[0][...]
            h = x.shape[1] // 2
            outs[0][...] = x[:, :h] + 1.0
            outs[1][...] = x[:, h:] + 1.0
        else:  # 2 in, 1 out
            outs[0][...] = jnp.concatenate(
                [ins[0][...], ins[1][...]], axis=1) + 1.0

    in_specs = [pl.BlockSpec((tb, a.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) for a in arrs]
    out_specs = [pl.BlockSpec((tb, s[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM) for s in out_shapes]
    total = sum(a.size for a in arrs) + sum(int(np.prod(s)) for s in out_shapes)
    kw = {}
    if aliases:
        kw["input_output_aliases"] = aliases
    return pl.pallas_call(
        kern,
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in out_shapes],
        cost_estimate=pl.CostEstimate(
            flops=total, bytes_accessed=4 * total, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
        **kw,
    )(*arrs)


b, n, tb = 8192, 512, 64
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
hr = jax.device_put(rng.standard_normal((b, n // 2)).astype(np.float32))
hi = jax.device_put(rng.standard_normal((b, n // 2)).astype(np.float32))


def alias4(v):
    r, i = v
    o = copy_call([r, i], [(b, n)] * 2, tb, aliases={0: 0, 1: 1})
    return o[0], o[1]


def seq2(v):
    r, i = v
    (o0,) = copy_call([r], [(b, n)], tb)
    # data dependency forces the second call after the first
    (o1,) = copy_call([i + o0[:1, :1] * 1e-30], [(b, n)], tb)
    return r + o0[:1] * 1e-30, i + o1[:1] * 1e-30


def par2(v):
    r, i = v
    (o0,) = copy_call([r], [(b, n)], tb)
    (o1,) = copy_call([i], [(b, n)], tb)
    return r + o0[:1] * 1e-30, i + o1[:1] * 1e-30


def r1w2(v):
    (o0, o1) = copy_call([v], [(b, n // 2)] * 2, tb)
    return v + jnp.concatenate([o0[:1], o1[:1]], axis=1) * 1e-30


def r2w1(v):
    r, i = v
    (o0,) = copy_call([r, i], [(b, n)], tb)
    return r + o0[:1, : n // 2] * 1e-30, i + o0[:1, n // 2:] * 1e-30


def r2w2h(v):
    r, i = v
    o = copy_call([r, i], [(b, n // 2)] * 2, tb)
    return r + o[0][:1] * 1e-30, i + o[1][:1] * 1e-30


CASES = [
    ("alias4 [64MB]", alias4, (zr, zi)),
    ("seq2   [64MB]", seq2, (zr, zi)),
    ("par2   [64MB]", par2, (zr, zi)),
    ("r1w2   [32MB]", r1w2, zr),
    ("r2w1   [32MB]", r2w1, (hr, hi)),
    ("r2w2h  [32MB]", r2w2h, (hr, hi)),
]
for rep in range(3):
    for name, body, init in CASES:
        try:
            t = t_us(body, init)
            print(f"  {name} rep{rep}: {t:.1f} us", flush=True)
        except Exception as ex:
            print(f"  {name} rep{rep}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:120]}", flush=True)

print("DONE", flush=True)
