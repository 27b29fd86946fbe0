"""Round-5 probe: complex-kernel batch-tile law at large N.

The real kernel's 2^19 law collapsed at N >= 2^14 (r5_tile_probe);
the complex law (tb*N ~ 2^18, cap 64) gives tb=8 at 2^15..2^17 —
the same per-grid-step-overhead regime. Sweep larger tiles; the old
note says >8 "fail compile at 2^17", so try/except per variant.
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
orig = pf._batch_tile


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


CASES = {14: (16, 32, 64), 15: (8, 16, 32), 16: (8, 16, 32), 17: (8, 16)}
for e, tiles in CASES.items():
    n, b = 1 << e, (1 << 22) >> e
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    auto_tb = orig(n, b)

    # numeric once under auto
    sr, si = jax.jit(cf.fft_planes)(zr, zi)
    ref = np.fft.fft(np.asarray(zr)[:2].astype(np.float64)
                     + 1j * np.asarray(zi)[:2].astype(np.float64), axis=-1)
    err = max(np.abs(np.asarray(sr)[:2] - ref.real).max(),
              np.abs(np.asarray(si)[:2] - ref.imag).max())
    print(f"  N=2^{e}: cfft numeric err {err:.2e} (bound {2e-7*n:.1e})", flush=True)

    for rep in range(2):
        for tb in tiles:
            if tb > b:
                continue

            def mk():
                def body(v):
                    r, i = v
                    fr, fi = cf.fft_planes(r, i)
                    return r + fr[:1, :] * 1e-30, i + fi[:1, :] * 1e-30
                return body

            pf._batch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
            tag = " (auto)" if tb == auto_tb else ""
            try:
                t = t_us(mk(), (zr, zi))
                print(f"  cfft 2^{e} fwd tb={tb}{tag} rep{rep}: {t:.1f} us = "
                      f"{b*n/t:.0f} Ms/s", flush=True)
            except Exception as ex:
                print(f"  cfft 2^{e} fwd tb={tb}{tag} rep{rep}: FAIL "
                      f"{type(ex).__name__}: {str(ex)[:120]}", flush=True)
            finally:
                pf._batch_tile = orig

print("DONE", flush=True)
