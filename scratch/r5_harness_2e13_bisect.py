import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(2)
n, b = 1 << 13, 512
x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zr_indep = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

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

CASES = {
    "pair( 8, 72) zr=x    ": ((8, 72), (x, zi)),
    "pair( 8, 72) zr indep": ((8, 72), (zr_indep, zi)),
    "pair(16,272) zr=x    ": ((16, 272), (x, zi)),
    "pair(16,272) zr indep": ((16, 272), (zr_indep, zi)),
}
loops = {}
for k, (pair, init) in CASES.items():
    loops[k] = [(it, make_loop(it)) for it in pair]
    for _, lp in loops[k]:
        jax.tree_util.tree_map(float, lp(init))
print("compiled", flush=True)
best = {k: [1e9, 1e9] for k in CASES}
for _ in range(5):
    for k, (pair, init) in CASES.items():
        for j, (_, lp) in enumerate(loops[k]):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, lp(init))
            best[k][j] = min(best[k][j], time.perf_counter() - t0)
for k, (pair, init) in CASES.items():
    t = (best[k][1] - best[k][0]) / (pair[1] - pair[0]) * 1e6
    print(f"{k}: {t:.1f} us = {b*n/t:.0f} Ms/s", flush=True)
print("DONE", flush=True)
