import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.ops import pallas_fft as pf
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n, b = 1 << 13, 512
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

def api_body(v):
    return cf.fft_planes(v[0], v[1])

def impl_body(v):
    return pf._cfft_pair_impl(v[0], v[1], n, pf.FFT_FORWARD, True)

def make_loop(body, iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop

cases = {"api ": api_body, "impl": impl_body}
loops = {k: [(it, make_loop(f, it)) for it in (16, 272)] for k, f in cases.items()}
for k in loops:
    for _, lp in loops[k]:
        jax.tree_util.tree_map(float, lp((zr, zi)))
    print(k, "compiled", flush=True)
best = {k: [1e9, 1e9] for k in cases}
for _ in range(5):
    for k in cases:
        for j, (_, lp) in enumerate(loops[k]):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, lp((zr, zi)))
            best[k][j] = min(best[k][j], time.perf_counter() - t0)
for k in cases:
    t = (best[k][1] - best[k][0]) / 256 * 1e6
    print(f"2^13 {k}: {t:.1f} us = {b*n/t:.0f} Ms/s fwd", flush=True)
print("DONE", flush=True)
