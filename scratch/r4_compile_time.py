"""Round 4: time the two Mosaic cold-compile blowups (probe F and G).

Usage: python scratch/r4_compile_time.py [F|G|G960]
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
import chowdsp_fft_tpu as cf

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
which = sys.argv[1] if len(sys.argv) > 1 else "F"


def stage(name, fn):
    t0 = time.time()
    out = fn()
    print(f"  {name}: {time.time()-t0:.1f}s", flush=True)
    return out


if which == "F":
    n, b = 4096, 1024
    x = rng.standard_normal((b, n)).astype(np.float32)
    h = rng.standard_normal((1, n)).astype(np.float32)

    def fused(xv, hv):
        ar, ai = cf.rfft_packed_unordered(xv)
        br, bi = cf.rfft_packed_unordered(hv)
        return cf.convolve_irfft_packed(ar, ai, br, bi, scaling=1.0 / n,
                                        ordered=False)

    lowered = stage("lower", lambda: jax.jit(fused).lower(x, h))
    compiled = stage("compile", lambda: lowered.compile())
    stage("run", lambda: np.asarray(compiled(x, h)))

elif which in ("G", "G960"):
    n = 576 if which == "G" else 960
    b = max(8, (1 << 21) // n)
    x = rng.standard_normal((b, n)).astype(np.float32)
    f = jax.jit(lambda v: cf.rfft_packed(v, engine="pallas"))
    lowered = stage("lower", lambda: f.lower(x))
    compiled = stage("compile", lambda: lowered.compile())
    stage("run", lambda: [np.asarray(a) for a in compiled(x)])

print("DONE", flush=True)
