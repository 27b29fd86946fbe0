"""Round-5 probe: the two remaining sweep dips.

(a) rfft 2^13 sits at 0.78-0.88 of governing vs ~0.97-1.03 at 2^12/2^14.
    2^13 kept the old tb = 2^19/n = 64 law; the refit starts at 2^14.
    A/B 64 (auto) vs 128/256.
(b) cfft 2^8 rt dips (15.1 Gs/s) vs 27.8 at 2^7 and 18.5 at 2^9.
    Complex auto tile at 2^8 is min(64, 2^18/256=1024) = 64; A/B
    32/128/256 plus the rt basis to see whether fwd or inverse owns it.
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


# (a) rfft 2^13 tiles
n, b = 1 << 13, (1 << 22) >> 13
x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
orig_r = pf._rbatch_tile
for rep in range(2):
    for tb in (64, 128, 256):
        def mk():
            def body(v):
                re, _ = cf.rfft_packed(v)
                pad = jnp.zeros((1, n - re.shape[1]), re.dtype)
                return v + jnp.concatenate([re[:1], pad], axis=1) * 1e-30
            return body

        pf._rbatch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
        try:
            t = t_us(mk(), x)
            tag = " (auto)" if tb == 64 else ""
            print(f"  rfft 2^13 fwd tb={tb}{tag} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)
        except Exception as ex:
            print(f"  rfft 2^13 fwd tb={tb} rep{rep}: FAIL {type(ex).__name__}", flush=True)
        finally:
            pf._rbatch_tile = orig_r

        def mkrt():
            def body(v):
                re, im = cf.rfft_packed(v)
                return cf.irfft_packed(re, im)
            return body

        pf._rbatch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
        try:
            t = t_us(mkrt(), x, pair=(8, 136))
            print(f"  rfft 2^13 rt tb={tb} rep{rep}: {t:.1f} us = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)
        except Exception as ex:
            print(f"  rfft 2^13 rt tb={tb} rep{rep}: FAIL {type(ex).__name__}", flush=True)
        finally:
            pf._rbatch_tile = orig_r

# (b) cfft 2^8 tiles, fwd + rt
n, b = 1 << 8, (1 << 22) >> 8
zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
orig_c = pf._batch_tile
for rep in range(2):
    for tb in (32, 64, 128, 256):
        def mkc():
            def body(v):
                r, i = v
                fr, fi = cf.fft_planes(r, i)
                return r + fr[:1, :] * 1e-30, i + fi[:1, :] * 1e-30
            return body

        def mkcrt():
            def body(v):
                r, i = v
                fr, fi = cf.fft_planes(r, i)
                return cf.ifft_planes(fr, fi)
            return body

        pf._batch_tile = (lambda _tb: lambda nn, bb: _tb)(tb)
        tag = " (auto)" if tb == 64 else ""
        try:
            tf = t_us(mkc(), (zr, zi))
            tr = t_us(mkcrt(), (zr, zi), pair=(8, 136))
            print(f"  cfft 2^8 tb={tb}{tag} rep{rep}: fwd {tf:.1f} us = "
                  f"{b*n/tf:.0f} Ms/s, rt {tr:.1f} us = {b*n/(tr/2):.0f} Ms/s/dir",
                  flush=True)
        except Exception as ex:
            print(f"  cfft 2^8 tb={tb} rep{rep}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:100]}", flush=True)
        finally:
            pf._batch_tile = orig_c

print("DONE", flush=True)
