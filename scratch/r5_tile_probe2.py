"""Round-5 tile probe, part 2: the missing boundary points.

Part 1 showed tb*N ~ 2^22 (full batch) wins at 2^15..2^17. Missing:
2^15 tb=128 (the 2^22/n law's pick there) and the 2^14 boundary
(auto=32 today; does 64/128 win there too?).
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
orig = pf._rbatch_tile


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


CASES = {14: (32, 64, 128, 256), 15: (32, 128)}
for e, tiles in CASES.items():
    n, b = 1 << e, (1 << 22) >> e
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    auto_tb = orig(n, b)
    bodies = {}
    for tb in tiles:
        if tb > b:
            continue

        def mk():
            def body(v):
                re, _ = cf.rfft_packed(v)
                pad = jnp.zeros((1, n - re.shape[1]), re.dtype)
                return v + jnp.concatenate([re[:1], pad], axis=1) * 1e-30
            return body

        bodies[tb] = mk()
    for rep in range(2):
        for tb, body in bodies.items():
            pf._rbatch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
            t = t_us(body, x)
            pf._rbatch_tile = orig
            tag = " (auto)" if tb == auto_tb else ""
            print(f"  rfft 2^{e} fwd tb={tb}{tag} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)

print("DONE", flush=True)
