"""Round-5 probe: joint-plane buffers vs separate planes (pass-through).

r5_io_floor showed 1in+1out at ~25us/32MB moved (full read/write
concurrency) while 2in+2out collapses to ~140us for 2x the bytes.
If a SINGLE (2, b, n) joint buffer per direction restores the 1-array
rate (~50-60us for 64MB), the complex kernels should move to a joint
plane layout (stack at the API boundary, joint end-to-end internally).
Variants at the 2^9 shape (b=8192, n=512; 64 MB total moved):
  sep4: 2in+2out (b,n)           [the current cfft IO form]
  lead2: 1in+1out (2,b,n), block (2,tb,n)
  minor2: 1in+1out (b,2n) re|im halves, block (tb,2n)
  batch2: 1in+1out (2b,n) planes stacked along batch, block (tb,n),
          grid doubled
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


def call(arrs, blocks, idxs, grid):
    k = len(arrs)

    def kern(*refs):
        for i_ref, o_ref in zip(refs[:k], refs[k:]):
            o_ref[...] = i_ref[...] + 1.0

    in_specs = [pl.BlockSpec(bl, ix, memory_space=pltpu.VMEM)
                for bl, ix in zip(blocks, idxs)]
    total = sum(a.size for a in arrs)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=in_specs,
        out_shape=[jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in arrs],
        cost_estimate=pl.CostEstimate(
            flops=total, bytes_accessed=8 * total, transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=pf._VMEM_LIMIT),
        interpret=pf._interpret(),
    )(*arrs)


b, n, tb = 8192, 512, 64
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
lead = jax.device_put(rng.standard_normal((2, b, n)).astype(np.float32))
minor = jax.device_put(rng.standard_normal((b, 2 * n)).astype(np.float32))
batch = jax.device_put(rng.standard_normal((2 * b, n)).astype(np.float32))


def sep4(v):
    r, i = v
    o = call([r, i], [(tb, n)] * 2, [lambda k: (k, 0)] * 2, b // tb)
    return r + o[0][:1] * 1e-30, i + o[1][:1] * 1e-30


def lead2(v):
    (o,) = call([v], [(2, tb, n)], [lambda k: (0, k, 0)], b // tb)
    return v + o[:, :1] * 1e-30


def minor2(v):
    (o,) = call([v], [(tb, 2 * n)], [lambda k: (k, 0)], b // tb)
    return v + o[:1] * 1e-30


def batch2(v):
    (o,) = call([v], [(tb, n)], [lambda k: (k, 0)], 2 * b // tb)
    return v + o[:1] * 1e-30


CASES = [("sep4", sep4, (zr, zi)), ("lead2", lead2, lead),
         ("minor2", minor2, minor), ("batch2", batch2, batch)]
for rep in range(3):
    for name, body, init in CASES:
        try:
            t = t_us(body, init)
            print(f"  {name} rep{rep}: {t:.1f} us (64MB moved; 2x16MB-rate "
                  f"would be ~50)", flush=True)
        except Exception as ex:
            print(f"  {name} rep{rep}: FAIL {type(ex).__name__}: {str(ex)[:100]}",
                  flush=True)

print("DONE", flush=True)
