import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import chowdsp_fft_tpu as cf
print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(2)
import sweep

def measure_2e13():
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
    best = [1e9, 1e9]
    for _ in range(5):
        for j, (_, lp) in enumerate(loops):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(float, lp((zr, zi)))
            best[j] = min(best[j], time.perf_counter() - t0)
    t = (best[1] - best[0]) / 256 * 1e6
    print(f"  2^13 fwd: {t:.1f} us = {b*n/t:.0f} Ms/s", flush=True)
    return t

print("fresh:", flush=True)
measure_2e13()
rows = []
for n in (1 << 11, 1 << 12):
    print(f"running sweep row N={n} ...", flush=True)
    sweep._config2_row(rows, rng, n, 1 << 22)
print("after sweep rows 2^11+2^12:", flush=True)
measure_2e13()
print("running sweep row N=2^13 itself ...", flush=True)
sweep._config2_row(rows, rng, 1 << 13, 1 << 22)
print([ (r["N"], r["cfft_fwd_Msps"]) for r in rows ], flush=True)
print("after its own row:", flush=True)
measure_2e13()
print("DONE", flush=True)
