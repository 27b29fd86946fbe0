"""Round 4: measurement-body A/B — carry-add vs direct feed-through.

The carry-add body (v + re[:, :1]*1e-30) inserts one elementwise pass
over the full (B, N) carry per iteration; feed-through chains the
transform output straight into the next iteration's input (values
diverge to inf, which TPU fp32 arithmetic processes at full speed, and
the buffer stays an HBM-resident pallas operand, so the kernel's IO is
still real). The delta is pure harness overhead baked into every
"fwd-only" number so far.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.ops import pallas_fft as pf
from chowdsp_fft_tpu.utils.profiling import op_seconds

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


print("\n== rfft fwd: carry-add vs joint feed-through ==", flush=True)
for e in (12, 13, 15):
    n, b = 1 << e, (1 << 22) >> e
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def carry(v):
        re, _ = cf.rfft_packed(v)
        return v + re[:, :1] * 1e-30

    def feed(v):
        return pf._rfft_packed_joint(v, n, True)  # (B, N) [re|im] buffer

    for rep in range(3):
        tc = t_us(carry, x)
        tf = t_us(feed, x)
        print(f"  2^{e} rep{rep}: carry {tc:.1f} us = {b*n/tc:.0f} Ms/s, "
              f"feed {tf:.1f} us = {b*n/tf:.0f} Ms/s "
              f"(harness {tc-tf:+.1f} us)", flush=True)

print("\n== cfft fwd ordered: carry-add vs planes feed-through ==", flush=True)
for e in (12, 15):
    n, b = 1 << e, (1 << 22) >> e
    ar = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    ai = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def carry2(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return r + sr[:, :1] * 1e-30, i + si[:, :1] * 1e-30

    def feed2(v):
        return cf.fft_planes(v[0], v[1])

    for rep in range(3):
        tc = t_us(carry2, (ar, ai))
        tf = t_us(feed2, (ar, ai))
        print(f"  2^{e} rep{rep}: carry {tc:.1f} us = {b*n/tc:.0f} Ms/s, "
              f"feed {tf:.1f} us = {b*n/tf:.0f} Ms/s "
              f"(harness {tc-tf:+.1f} us)", flush=True)

print("DONE", flush=True)
