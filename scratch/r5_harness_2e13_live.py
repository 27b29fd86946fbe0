import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n, b = 1 << 13, 512
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

def body(v):
    return cf.fft_planes(v[0], v[1])

def make_loop(iters):
    @jax.jit
    def loop(v):
        def step(c, _):
            return body(c), None
        c, _ = jax.lax.scan(step, v, None, length=iters)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a * 0.0), c)
    return loop

loops = [(it, make_loop(it)) for it in (16, 272)]
for _, lp in loops:
    jax.tree_util.tree_map(float, lp((zr, zi)))
print("compiled", flush=True)

def slope():
    best = [1e9, 1e9]
    for _ in range(5):
        for j, (_, lp) in enumerate(loops):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, lp((zr, zi)))
            best[j] = min(best[j], time.perf_counter() - t0)
    return (best[1] - best[0]) / 256 * 1e6

t0 = slope()
print(f"bare: {t0:.1f} us = {b*n/t0:.0f} Ms/s", flush=True)
# pin extra live buffers like the sweep row does (x + rfft outputs etc.)
extras = [jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
          for _ in range(4)]  # 4 x 16 MB extra live
float(jnp.sum(extras[0]))
t1 = slope()
print(f"with 64MB extra live: {t1:.1f} us = {b*n/t1:.0f} Ms/s", flush=True)
del extras
import gc; gc.collect()
t2 = slope()
print(f"freed: {t2:.1f} us = {b*n/t2:.0f} Ms/s", flush=True)
print("DONE", flush=True)
