"""Round-5 probe: batch-tile law at the large single-kernel sizes.

Round-4 sweep: rfft fwd 2^15..2^17 sits at 0.37-0.49 of governing
(rows 128..32, tile law gives tb=16/16/8 there via max(16, 2^19/n)
capped by b8). Question: is the per-grid-step overhead at those tiny
tiles the gap, i.e. does a bigger (or smaller) tb win? Monkeypatch
pf._rbatch_tile per variant; every variant gets a fresh lambda so jit
can't reuse a stale trace. Row-carry fwd bodies (round-4 methodology).
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


for e in (15, 16, 17):
    n, b = 1 << e, (1 << 22) >> e
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    auto_tb = orig(n, b)
    tiles = sorted({8, 16, 32, min(b, 64), auto_tb})
    bodies = {}
    for tb in tiles:
        if tb > b:
            continue
        pf._rbatch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)

        def mk():
            def body(v):
                re, _ = cf.rfft_packed(v)
                pad = jnp.zeros((1, n - re.shape[1]), re.dtype)
                return v + jnp.concatenate([re[:1], pad], axis=1) * 1e-30
            return body

        # trace now (while the patch is live) by compiling once
        body = mk()
        bodies[tb] = body
    pf._rbatch_tile = orig
    for rep in range(2):
        for tb, body in bodies.items():
            pf._rbatch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
            t = t_us(body, x)
            pf._rbatch_tile = orig
            tag = " (auto)" if tb == auto_tb else ""
            print(f"  rfft 2^{e} fwd tb={tb}{tag} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)

print("DONE", flush=True)
