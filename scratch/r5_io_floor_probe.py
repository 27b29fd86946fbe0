"""Round-5 probe: is the cfft IO floor array-count or bandwidth-pattern?

The depth-cut probe showed a 4-array (2 in + 2 out) pass-through at
132-151us vs the 82us duplex bound. A/B: 2-array (1 in + 1 out)
pass-through at the same total bytes (n doubled) and at half the bytes
(same n), plus an 8-array variant (4 in + 4 out, half-size planes,
same total bytes). If time scales with ARRAY COUNT at fixed bytes, the
fix is joint-plane buffers; if it scales with BYTES only, the floor is
a BW-pattern limit and joint buffers won't help.
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


def passthrough(arrs, tb):
    """k-array pass-through pallas call, grid over batch tiles."""
    k = len(arrs)
    b, n = arrs[0].shape

    def kern(*refs):
        ins, outs = refs[:k], refs[k:]
        for i_ref, o_ref in zip(ins, outs):
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


b, n = 8192, 512  # the 2^9 mid-band shape; 16 MB per (b, n) plane
x = [jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
     for _ in range(4)]
xwide = [jax.device_put(rng.standard_normal((b, 2 * n)).astype(np.float32))
         for _ in range(2)]
xhalf = [jax.device_put(rng.standard_normal((b, n // 2)).astype(np.float32))
         for _ in range(8)]

CASES = [
    ("2in+2out x (b,2n) [64MB]", xwide, 2),
    ("4in+4out x (b,n)  [64MB]", x, 4),
    ("8in+8out x (b,n/2)[64MB]", xhalf, 8),
    ("1in+1out x (b,n)  [16MB]", x[:1], 1),
    ("2in+2out x (b,n)  [32MB]", x[:2], 2),
]

for rep in range(2):
    for name, arrs, k in CASES:
        def mk(a):
            def body(v):
                outs = passthrough(list(v), 64)
                return tuple(vv + oo[:1] * 1e-30 for vv, oo in zip(v, outs))
            return body
        t = t_us(mk(arrs), tuple(arrs))
        total_mb = sum(a.size for a in arrs) * 4 / (1 << 20) * 2
        bound = total_mb * (1 << 20) / 819e9 * 1e6
        print(f"  {name} rep{rep}: {t:.1f} us (duplex bound {bound:.1f})",
              flush=True)

print("DONE", flush=True)
