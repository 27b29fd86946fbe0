"""Round-3 on-chip probes, run when the TPU tunnel recovers.

Sections (all same-process, interleaved A/B per the NOTES methodology):
  A. N=512 rfft anomaly: tb sweep + HBM-floor probe (VERDICT r2 weak #6)
  B. 2^18 composite A/B: v2 vs v1, cfft + rfft (VERDICT r2 #1a)
  C. irfft vs rfft parity at N=4096/B=1024 (VERDICT r2 weak #7)
  D. cfft fwd-basis at N=4096 + kernel-vs-composite-v2 at 2^17
  E. IO/MXU overlap bisect (plain copy kernel + matmul chain)
  F. fused convolve_irfft_packed verify + A/B
  G. medium-N direct-DFT composite (576/960/1440) vs the portable engine
     (VERDICT r2 missing #2 "measured win over portable recorded in NOTES")
  H. batch-chunked composite v2 (the unordered layout fix) on chip:
     numeric at N=196608 cross-batch convolve + A/B chunked-v2 vs v1 at
     2^18 b=64 (if chunked v2 wins, flip the ORDERED large-batch dispatch
     to it too)
  I. manual double-buffered rfft (_rfft_packed_joint_db) vs the grid
     pipeliner at the headline shape + N=2^13/2^15 — the probe-E
     fallback pattern, pre-built so the A/B runs in the same pass
Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/drive_r3_probes.py [A B C D E F G H I]
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
SECTIONS = set(sys.argv[1:]) or {"A", "B", "C", "D", "E", "F", "G", "H", "I"}


def t_us(body, init, pair=(16, 272)):
    return op_seconds(body, init, iters_pair=pair) * 1e6


def fwd_body(v):
    re, _ = cf.rfft_packed(v)
    return v + re[:, :1] * 1e-30


def rt_body(v):
    re, im = cf.rfft_packed(v)
    return cf.irfft_packed(re, im)


if "A" in SECTIONS:
    print("\n== A: N=512 anomaly (B=8192) ==", flush=True)
    n, b = 512, 8192
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    orig = pf._rbatch_tile
    results = {}
    for rep in range(2):
        for tb in (64, 128, 256, 512):
            pf._rbatch_tile = lambda nn, bb, _tb=tb: min(_tb, orig(nn, bb) * 8)
            # fresh closure => fresh jit trace per variant
            t = t_us(lambda v: fwd_body(v), x)
            results.setdefault(tb, []).append(t)
            print(f"  tb={tb} rep{rep}: fwd {t:.1f} us", flush=True)
    pf._rbatch_tile = orig
    for tb, ts in results.items():
        ms = b * n / (min(ts) * 1e-6) / 1e6
        print(f"  tb={tb}: best {min(ts):.1f} us = {ms:.0f} Ms/s", flush=True)
    # HBM floor probe: pure copy-scale at the same shape (2 passes)
    t = t_us(lambda v: v * 1.0000001, x)
    print(f"  copy-scale floor: {t:.1f} us (model {b*n*8/819e9*1e6:.1f})", flush=True)
    # Candidate fix (VERDICT r2 weak #6): direct-DFT at 512 — dense
    # (512,512) column-packed matmul instead of the n1=4 Stockham kernel.
    orig_sd = pf._small_dispatch
    for rep in range(2):
        for name, on in (("stockham", False), ("direct512", True)):
            pf._small_dispatch = (lambda nn: nn == 512 or orig_sd(nn)) if on else orig_sd
            t = t_us(lambda v: fwd_body(v), x)
            print(f"  {name} rep{rep}: fwd {t:.1f} us = {b*n/t:.0f} Ms/s", flush=True)
    pf._small_dispatch = orig_sd
    # neighbors for context
    for nn in (256, 1024):
        bb = (1 << 22) // nn
        xx = jax.device_put(rng.standard_normal((bb, nn)).astype(np.float32))
        t = t_us(lambda v: fwd_body(v), xx)
        print(f"  N={nn} B={bb}: fwd {t:.1f} us = {bb*nn/t:.0f} Ms/s", flush=True)

if "B" in SECTIONS:
    print("\n== B: 2^18 composite v2 vs v1 ==", flush=True)
    n, b = 1 << 18, 16
    xr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def cfft_rt(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return cf.ifft_planes(sr, si)

    orig_v2 = pf._v2_supported
    orig_rdc = pf._rdc_v2_supported
    for rep in range(2):
        for name, on in (("v2", True), ("v1", False)):
            pf._v2_supported = orig_v2 if on else (lambda *a: False)
            t = t_us(lambda v: cfft_rt(v), (xr, xi), pair=(8, 72))
            print(f"  cfft rt {name} rep{rep}: {t:.1f} us/iter = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)
    pf._v2_supported = orig_v2
    for rep in range(2):
        for name, on in (("v2", True), ("v1", False)):
            pf._rdc_v2_supported = orig_rdc if on else (lambda *a: False)
            t = t_us(lambda v: rt_body(v), xr, pair=(8, 72))
            print(f"  rfft rt {name} rep{rep}: {t:.1f} us/iter = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)
    pf._rdc_v2_supported = orig_rdc
    # sanity: 2^17 and 2^19 neighbors (auto dispatch)
    for e in (17, 19):
        nn, bb = 1 << e, (1 << 22) >> e
        ar = jax.device_put(rng.standard_normal((bb, nn)).astype(np.float32))
        ai = jax.device_put(rng.standard_normal((bb, nn)).astype(np.float32))
        t = t_us(lambda v: cfft_rt(v), (ar, ai), pair=(8, 72))
        print(f"  cfft rt 2^{e} auto: {bb*nn/(t/2):.0f} Ms/s/dir", flush=True)

if "C" in SECTIONS:
    print("\n== C: irfft vs rfft, N=4096 B=1024 ==", flush=True)
    n, b = 4096, 1024
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    re0, im0 = jax.jit(cf.rfft_packed)(x)
    re0 = jax.device_put(np.asarray(re0))
    im0 = jax.device_put(np.asarray(im0))

    def inv_body(v):
        r, i = v
        y = cf.irfft_packed(r, i)
        return r + y[:, :1] * 1e-30, i

    for rep in range(2):
        tf = t_us(lambda v: fwd_body(v), x)
        ti = t_us(lambda v: inv_body(v), (re0, im0))
        print(f"  rep{rep}: rfft {tf:.1f} us, irfft {ti:.1f} us "
              f"(gap {100*(ti-tf)/tf:+.1f}%)", flush=True)

if "D" in SECTIONS:
    print("\n== D: cfft fwd-basis + 2^17 kernel-vs-v2 ==", flush=True)
    n, b = 4096, 1024
    zr = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    zi = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def cfwd(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return r + sr[:, :1] * 1e-30, i + si[:, :1] * 1e-30

    t = t_us(lambda v: cfwd(v), (zr, zi))
    print(f"  cfft fwd N=4096: {t:.1f} us = {b*n/t:.0f} Ms/s "
          f"(serial bound ~187 us / 22.4 Gs/s)", flush=True)
    # 2^17: single kernel (auto) vs forced composite v2
    n, b = 1 << 17, 32
    ar = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    ai = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def cfft_rt(v):
        r, i = v
        sr, si = cf.fft_planes(r, i)
        return cf.ifft_planes(sr, si)

    orig_max = pf._MAX_N
    for rep in range(2):
        for name, mx in (("kernel", orig_max), ("composite-v2", (1 << 16))):
            pf._MAX_N = mx
            t = t_us(lambda v: cfft_rt(v), (ar, ai), pair=(8, 72))
            print(f"  2^17 {name} rep{rep}: {b*n/(t/2):.0f} Ms/s/dir", flush=True)
    pf._MAX_N = orig_max

if "F" in SECTIONS:
    # On-chip check of the fused convolve-irfft kernel (round 3): Mosaic
    # compile + numeric vs f64 + A/B vs the unfused composition.
    print("\n== F: fused convolve_irfft_packed, N=4096 B=1024 ==", flush=True)
    n, b = 4096, 1024
    x = rng.standard_normal((b, n)).astype(np.float32)
    h = rng.standard_normal((1, n)).astype(np.float32)
    ref = np.real(np.fft.ifft(np.fft.fft(x.astype(np.float64), axis=-1)
                              * np.fft.fft(h.astype(np.float64), axis=-1), axis=-1))

    @jax.jit
    def fused(xv, hv):
        ar, ai = cf.rfft_packed_unordered(xv)
        br, bi = cf.rfft_packed_unordered(hv)
        return cf.convolve_irfft_packed(ar, ai, br, bi, scaling=1.0 / n,
                                        ordered=False)

    y = np.asarray(fused(jax.device_put(x), jax.device_put(h)))
    err = np.abs(y - ref).max()
    print(f"  numeric: max err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
    assert err < 2e-7 * n

    def chain_fused(v):
        ar, ai = cf.rfft_packed_unordered(v)
        br, bi = cf.rfft_packed_unordered(v[:1])
        return cf.convolve_irfft_packed(ar, ai, br, bi, scaling=1.0 / n,
                                        ordered=False)

    def chain_unfused(v):
        ar, ai = cf.rfft_packed_unordered(v)
        br, bi = cf.rfft_packed_unordered(v[:1])
        pr, pi = cf.convolve_accumulate_packed((ar, ai), (br, bi),
                                               scaling=1.0 / n)
        return cf.irfft_packed_unordered(pr, pi)

    xd = jax.device_put(x)
    for rep in range(2):
        tf = t_us(lambda v: chain_fused(v), xd, pair=(8, 136))
        tu = t_us(lambda v: chain_unfused(v), xd, pair=(8, 136))
        print(f"  rep{rep}: chain fused {tf:.1f} us, unfused {tu:.1f} us "
              f"({100*(tu-tf)/tu:.1f}% saved)", flush=True)

if "E" in SECTIONS:
    # Does Mosaic overlap the block DMA with MXU compute? A copy kernel
    # with a tunable dependent-matmul chain on the tile: time(reps) flat
    # until compute > IO => overlap (the serial-phase bound is breakable);
    # linear from reps=0 => DMA and compute serialize (bound confirmed).
    print("\n== E: IO/MXU overlap probe, N=4096 B=1024 tb=128 ==", flush=True)
    from functools import partial

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, b, tb = 4096, 1024, 128
    x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    m = jax.device_put(np.eye(128, dtype=np.float32) * (1.0 + 1e-7))

    def kern(x_ref, m_ref, o_ref, *, reps):
        v = x_ref[...]
        if reps:
            acc = v.reshape(tb * (n // 128), 128)
            for _ in range(reps):
                acc = jax.lax.dot_general(
                    acc, m_ref[...], (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                )
            o_ref[...] = v + acc.reshape(tb, n) * 1e-30
        else:
            o_ref[...] = v

    def run(v, reps):
        return pl.pallas_call(
            partial(kern, reps=reps),
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(v, m)

    # per-step rows = tb*32 = 4096 -> model 3.27 us/matmul; IO 2 passes
    # of 16.8 MB -> ~41 us. reps=16 ~ 52 us of MXU work.
    for rep in range(2):
        for reps in (0, 4, 8, 16, 24, 32):
            t = t_us(lambda v, _r=reps: run(v, _r), x)
            model_mxu = reps * b * (n // 128) * 6 / 8 / 0.94e9 * 1e6
            print(f"  reps={reps:2d} rep{rep}: {t:7.1f} us  "
                  f"(serial model {41 + 10 + model_mxu:.0f}, "
                  f"overlap model {max(41, model_mxu) + 10:.0f})", flush=True)

    # bisect variant: same IO + 16 matmuls + an in-kernel (tb,32,128) ->
    # (32,tb,128) transpose, the real kernel's input-relayout shape — does
    # the transpose break whatever overlap the plain variant shows?
    def kern_t(x_ref, m_ref, o_ref):
        v = x_ref[...]
        w = jnp.swapaxes(v.reshape(tb, n // 128, 128), 0, 1)
        acc = w.reshape(tb * (n // 128), 128)
        for _ in range(16):
            acc = jax.lax.dot_general(
                acc, m_ref[...], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
        w2 = jnp.swapaxes(acc.reshape(n // 128, tb, 128), 0, 1)
        o_ref[...] = w2.reshape(tb, n)

    def run_t(v):
        return pl.pallas_call(
            kern_t,
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec((tb, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tb, n), lambda k: (k, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
        )(v, m)

    for rep in range(2):
        t = t_us(lambda v: run_t(v), x)
        print(f"  reps=16+transpose rep{rep}: {t:7.1f} us", flush=True)

if "G" in SECTIONS:
    print("\n== G: medium-N composite vs portable ==", flush=True)
    for n in (576, 960, 1440, 3600):
        b = max(8, (1 << 21) // n)
        x = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
        # numeric first (Mosaic compile check on real silicon)
        re, im = map(np.asarray, jax.jit(
            lambda v: cf.rfft_packed(v, engine="pallas"))(x))
        ref = np.fft.rfft(np.asarray(x).astype(np.float64), axis=-1)
        err = max(np.abs(re[:, 1:] - ref[:, 1 : n // 2].real).max(),
                  np.abs(im[:, 1:] - ref[:, 1 : n // 2].imag).max())
        print(f"  N={n}: err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
        for rep in range(2):
            res = {}
            for eng in ("pallas", "stockham"):
                def body(v, _e=eng):
                    r, i = cf.rfft_packed(v, engine=_e)
                    return cf.irfft_packed(r, i, engine=_e)
                res[eng] = t_us(lambda v, _b=body: _b(v), x, pair=(8, 136))
            p, s = res["pallas"], res["stockham"]
            print(f"  N={n} B={b} rep{rep}: pallas {p:.1f} us, portable "
                  f"{s:.1f} us ({s/p:.2f}x) = {b*n/(p/2):.0f} Ms/s/dir",
                  flush=True)

if "H" in SECTIONS:
    print("\n== H: batch-chunked composite v2 ==", flush=True)
    # numeric: the layout-fix contract on real silicon — cross-batch
    # unordered convolve at a size where batch 64 chunks (cap=32) but
    # batch 1 does not
    n, b = 196608, 64
    assert 0 < pf._v2_batch_cap(n) < b, pf._v2_batch_cap(n)  # chunking engaged
    x = rng.standard_normal((b, n)).astype(np.float32) + 0j
    x = x + 1j * rng.standard_normal((b, n)).astype(np.float32)
    h = (rng.standard_normal((1, n)) + 1j * rng.standard_normal((1, n))).astype(
        np.complex64
    )

    @jax.jit
    def conv_unordered(xr, xi, hr, hi):
        ar, ai = cf.fft_planes_unordered(xr, xi)
        br, bi = cf.fft_planes_unordered(hr, hi)
        pr = ar * br - ai * bi
        pi = ar * bi + ai * br
        return cf.ifft_planes_unordered(pr, pi)

    got_r, got_i = map(
        np.asarray,
        conv_unordered(
            jax.device_put(x.real.astype(np.float32)),
            jax.device_put(x.imag.astype(np.float32)),
            jax.device_put(h.real.astype(np.float32)),
            jax.device_put(h.imag.astype(np.float32)),
        ),
    )
    ref = np.fft.ifft(
        np.fft.fft(x[:2].astype(np.complex128), axis=-1)
        * np.fft.fft(h.astype(np.complex128), axis=-1),
        axis=-1,
    )
    err = np.abs((got_r[:2] + 1j * got_i[:2]) / n - ref).max()
    bound = 2e-7 * n * np.sqrt(n)  # conv-e2e convention (test_pallas_engine)
    print(f"  cross-batch conv numeric: err {err:.2e} (bound {bound:.1e})",
          flush=True)
    assert err < bound

    # A/B: chunked v2 vs v1 at 2^18 b=64 round trip (ordered entry)
    n, b = 1 << 18, 64
    ar = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    ai = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def rt_v2c(v):
        r, i = v
        sr, si = pf._cfft_composite_v2_batched(r, i, n, True)
        br, bi = pf._cfft_composite_v2_batched(sr, si, n, False)
        return br, bi

    def rt_v1(v):
        r, i = v
        sr, si = pf._cfft_pair_large_v1(r, i, n, True, True)
        return pf._cfft_pair_large_v1(sr, si, n, False, True)

    for rep in range(2):
        for name, body in (("chunked-v2", rt_v2c), ("v1", rt_v1)):
            t = t_us(lambda v, _b=body: _b(v), (ar, ai), pair=(4, 36))
            print(f"  2^18 b=64 rt {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)

    # real path: chunked v2 vs v1 chain at 2^18 b=64 (cap is ~32 there)
    xr64 = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def rrt_v2c(v):
        r, i = cf.rfft_packed(v)  # dispatches to chunked v2
        return cf.irfft_packed(r, i)

    def rrt_v1(v):
        r, i = pf._rfft_direct_composite_v1(v)
        return pf._irfft_direct_composite_v1(r, i)

    print(f"  real cap at 2^18: {pf._rdc_batch_cap(n)}", flush=True)
    for rep in range(2):
        for name, body in (("real chunked-v2", rrt_v2c), ("real v1", rrt_v1)):
            t = t_us(lambda v, _b=body: _b(v), xr64, pair=(4, 36))
            print(f"  2^18 b=64 rt {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)

if "I" in SECTIONS:
    print("\n== I: manual double-buffered rfft vs grid pipeliner ==", flush=True)
    # numeric spot-check on silicon first (interpret-mode checked on CPU)
    n, b = 4096, 1024
    x_np = rng.standard_normal((b, n)).astype(np.float32)
    x = jax.device_put(x_np)
    grid_fn = jax.jit(lambda v: pf._rfft_packed_joint(v, n, True))
    db_fn = jax.jit(lambda v: pf._rfft_packed_joint_db(v, n, True))
    d = float(jnp.max(jnp.abs(grid_fn(x) - db_fn(x))))
    print(f"  db-vs-grid max abs diff (N=4096): {d:.2e} (expect 0)", flush=True)
    assert d < 1e-4, d  # same tile math; tolerance only guards sched diffs

    for nn in (4096, 8192, 32768):
        bb = (1 << 22) // nn
        xx = jax.device_put(rng.standard_normal((bb, nn)).astype(np.float32))
        res = {}
        for rep in range(3):
            for name, impl in (("grid", pf._rfft_packed_joint),
                               ("db", pf._rfft_packed_joint_db)):
                t = t_us(
                    lambda v, _i=impl, _n=nn: v + _i(v, _n, True)[:, :1] * 1e-30,
                    xx,
                )
                res.setdefault(name, []).append(t)
                print(f"  N={nn} B={bb} {name} rep{rep}: {t:.1f} us = "
                      f"{bb*nn/t:.0f} Ms/s", flush=True)
        g, dmin = min(res["grid"]), min(res["db"])
        print(f"  N={nn}: grid {g:.1f} vs db {dmin:.1f} us "
              f"({'DB WINS' if dmin < g else 'grid wins'} "
              f"{abs(g-dmin)/g*100:.0f}%)", flush=True)

    # inverse direction at the headline shape
    n, b = 4096, 1024
    m = n // 2
    yre = jax.device_put(rng.standard_normal((b, m)).astype(np.float32))
    yim = jax.device_put(rng.standard_normal((b, m)).astype(np.float32))
    gi = jax.jit(lambda r, i: pf._pallas_irfft_packed_impl(r, i, n, True))
    di = jax.jit(lambda r, i: pf._irfft_packed_db(r, i, n, True))
    d = float(jnp.max(jnp.abs(gi(yre, yim) - di(yre, yim))))
    print(f"  irfft db-vs-grid max abs diff: {d:.2e} (expect 0)", flush=True)
    assert d < 1e-3, d
    for rep in range(3):
        for name, impl in (("grid", pf._pallas_irfft_packed_impl),
                           ("db", pf._irfft_packed_db)):
            t = t_us(
                lambda v, _i=impl: (
                    v[0] + _i(v[0], v[1], n, True)[:, :1] * 1e-30, v[1]
                ),
                (yre, yim),
            )
            print(f"  irfft N={n} B={b} {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/t:.0f} Ms/s", flush=True)

    # complex kernel: the big overlap candidate (serial bound = 82us IO +
    # ~105us compute per direction at the headline shape — overlap would
    # approach max() of the two). Round trip fwd(folded) + reverse.
    n, b = 4096, 1024
    ar = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))
    ai = jax.device_put(rng.standard_normal((b, n)).astype(np.float32))

    def crt(pair_fn, v):
        r, i = v
        sr, si = pair_fn(r, i, n, True, False)
        br, bi = pair_fn(sr, si, n, False, True)
        return br, bi

    gc = jax.jit(lambda r, i: crt(pf._pallas_cfft_pair, (r, i)))
    dc = jax.jit(lambda r, i: crt(pf._cfft_pair_db, (r, i)))
    dg, di_ = gc(ar, ai), dc(ar, ai)
    d = max(float(jnp.max(jnp.abs(dg[0] - di_[0]))),
            float(jnp.max(jnp.abs(dg[1] - di_[1]))))
    print(f"  cfft rt db-vs-grid max abs diff: {d:.2e} (expect 0)", flush=True)
    assert d < 1e-2 * n, d
    for rep in range(3):
        for name, impl in (("grid", pf._pallas_cfft_pair),
                           ("db", pf._cfft_pair_db)):
            t = t_us(lambda v, _i=impl: crt(_i, v), (ar, ai))
            print(f"  cfft rt N={n} B={b} {name} rep{rep}: {t:.1f} us = "
                  f"{b*n/(t/2):.0f} Ms/s/dir", flush=True)

print("\nDONE", flush=True)
