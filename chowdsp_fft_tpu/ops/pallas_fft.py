"""Pallas TPU "metal" FFT engine: four-step kernel with MXU merge.

This is the TPU-native replacement for the reference's SIMD backends
(/root/reference/simd/chowdsp_fft_impl_{sse,avx,neon}.cpp). The reference's
core trick is to run w interleaved sub-FFTs in SIMD lanes and merge them
with register transposes + twiddles (the pffft "internal layout";
pffft_cplx_finalize at sse:434-496, SURVEY.md section 2 row 9). Here the
same decomposition is re-derived for TPU hardware:

  N = N1 * 128. View x as a row-major (N1, 128) matrix: n = n1*128 + n2.
    step 1: Stockham FFTs of length N1 along the *sublane* axis — all
            vector ops, contiguous blocks, no reorder pass (VPU);
  step 2: twiddle multiply by W_N^(k1*n2)                        (VPU);
  step 3: 128-point DFT along the *lane* axis as a matmul with the
          (128, 128) DFT matrix — this is the merge stage, and it runs
          on the MXU systolic array instead of shuffle networks.

After step 3 the array holds X[k1 + N1*k2] at position [k1, k2]: a
digit-transposed permutation. That *is* this engine's "unordered" layout —
the exact analog of pffft's internal order (fft_transform_unordered,
/root/reference/chowdsp_fft.h:140-145): frequency-domain convolution is
layout-independent, so the convolve path never pays for reordering.
Ordered output = one extra (N1, 128) transpose, the moral equivalent of
pffft_zreorder (sse:1466-1515).

The inverse consuming unordered layout runs the mirrored pipeline
(conj matmul -> conj twiddle -> backward Stockham) and lands directly in
natural time order.

Complex data is SoA (separate float32 re/im planes) throughout — the
TPU-idiomatic layout (SURVEY.md section 7) — which also sidesteps the axon
runtime's missing complex64 transfers.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..plans import (
    FFT_BACKWARD,
    FFT_COMPLEX,
    FFT_FORWARD,
    FFT_REAL,
    FFTPlan,
    InvalidSizeError,
    cached_plan,
)
from .. import api as _api

__all__ = [
    "cfft",
    "rfft",
    "irfft",
    "rfft_packed",
    "irfft_packed",
    "convolve_irfft_packed",
    "supports_plan",
    "prefer_plan",
    "merge_precision",
    "LANES",
]

LANES = 128  # TPU vector lane count == the merge radix
_MIN_N = 2 * LANES  # smallest N with a nontrivial sublane FFT
# Small-N direct-DFT path: one MXU matmul per tile, no Stockham stages
# (the reference's SIMD path covers N down to 32 via its N % w^2 rule,
# /root/reference/simd/chowdsp_fft_impl_common.hpp:165-177; here any valid
# size below the Stockham kernel's floor runs as a dense (g*N, g*N)
# block-diagonal DFT matmul with g = 128//N transforms packed per lane row).
_MIN_SMALL = 8
# Direct-DFT cost per signal ~ 6*N^2/16384 MXU row-passes vs the Stockham
# kernel's ~6*N/64: equal at exactly N=256, where direct also skips all
# stage/flatten work — so 256 dispatches direct. Between 256 and 512 the
# direct path additionally covers the {2,3,5}-smooth sizes that are NOT
# multiples of 128 (320, 360, 400, 480, ...), which previously fell to the
# portable engine.
_MAX_SMALL = 256
_MAX_SMALL_FALLBACK = 511  # direct beats the portable engine up to here
# Single-kernel bound: N=2^17 compiles and runs on v5e (tb=8); 2^18 fails
# Mosaic compilation. Measured 1.6-2.2x faster than the HBM-staged
# composite at 2^16..2^17, so the kernel runs as large as it can.
_MAX_N = 131072
_MAX_COMPOSITE = 1 << 20  # two-level four-step (HBM-staged) upper bound

# VMEM working set per grid step scales as batch_tile * N; keep
# batch_tile * N under this so in/out double-buffered planes + butterfly
# temporaries fit the per-kernel VMEM budget (v5e OOMs at ~16MB scoped by
# default; we raise the cap but stay conservative for pipelining).
_TILE_ELEMS = 1 << 17
_VMEM_LIMIT = 100 * (1 << 20)

# Ordered complex IO rides inside the kernel (minor-2D-transpose chain,
# same pattern as the real kernel's to_plane) instead of a separate XLA
# digit-transpose pass over HBM — but only for small row counts: the
# in-kernel chain costs ~n1-proportional shuffle work while the external
# XLA transpose is flat (~one HBM round trip). Measured gate history:
# round 4 (un-aliased kernel, scratch/r4_ordered_ab.py) put the crossover
# at n1=32; round 5 re-measured with input_output_aliases live
# (scratch/r5_ordkernel_ab.py + log): n1=64 in-kernel WINS 252 vs 333us
# at 2^13, n1=128 loses 383 vs 299, n1=256 loses 641 vs 282 — the
# aliased kernel is 40% faster so the flat external pass weighs more.
# None for "never", else the largest n1 that takes the in-kernel form.
# Module knob so the on-chip A/B can force either form. Mirrored by
# utils/roofline.ORDERED_IN_KERNEL_MAX_N1 (natural order above the gate
# structurally costs one extra HBM round trip); a test pins them equal.
_ORDERED_IN_KERNEL_MAX_N1: int | None = 64

# In-place (buffer-donating) kernel IO: declare input_output_aliases on
# every 2-plane kernel whose in/out BlockSpecs are identical, so the output
# planes land on the input pages. Round-5 measurement (r5_stream_probe +
# r5_io_floor_probe, benchmarks/NOTES.md): the v5e HBM controller runs a
# kernel at the full duplex bound only while the LIVE in+out footprint is
# <= ~32 MB — a 2in+2out complex kernel at 16 MB/plane (64 MB live) is
# floored at ~0.5x duplex, and the alias halves the footprint back into
# the fast window (2.2x pass-through). XLA keeps the semantics functional:
# when the caller still needs the input value it inserts a defensive copy,
# so this is also the TPU-native form of the reference's documented
# "input and output may alias" capability (/root/reference/chowdsp_fft.h:136).
# Module switch (not a runtime arg) so the on-chip A/B can force either form.
_ALIAS_KERNELS = True


def _alias_io(k: int = 2) -> dict[int, int] | None:
    """input_output_aliases for the first k in-planes -> k out-planes."""
    return {i: i for i in range(k)} if _ALIAS_KERNELS else None


def _ordered_in_kernel(n: int) -> bool:
    cap = _ORDERED_IN_KERNEL_MAX_N1
    return cap is not None and n // LANES <= cap


def _batch_tile(n: int, b: int) -> int:
    """Complex-kernel batch tile: tb*N ~ 2^18 elements (half the real
    kernel's law — 2x planes in flight), cap 64 (measured: 2^12 tb=64
    +12% over 32; N=1024 32 == 64; sub-8 tiles at 2^16+ stay at 8 —
    larger ones fail compile at 2^17). b-clamped so tiny batches don't
    pad up to a full tile."""
    b8 = -(-b // 8) * 8
    tb = max(8, min(64, (1 << 18) // n, b8))
    return (tb // 8) * 8


def _is_smooth_multiple(n: int) -> bool:
    """N = n1 * 128 with n1 {2,3,5}-smooth — the single-kernel domain
    (mixed-radix Stockham stages mirror the reference's radix set,
    /root/reference/simd/chowdsp_fft_impl_common.hpp:51-82)."""
    if n % LANES:
        return False
    from ..plans import InvalidSizeError, factorize

    try:
        factorize(n // LANES)
    except InvalidSizeError:
        return False
    return True


def _has_composite_split(n: int, real: bool = False) -> bool:
    if n > _MAX_COMPOSITE:
        return False
    try:
        _split_large(n, real)
    except InvalidSizeError:
        return False
    return True



def _small_dispatch(n: int) -> bool:
    """Route to the direct-DFT matmul path: everything up to 256, plus the
    {2,3,5}-smooth sizes below 512 that are not multiples of 128 (no
    Stockham kernel exists for those; direct beats the portable engine)."""
    if n <= _MAX_SMALL:
        return n >= _MIN_SMALL
    return n <= _MAX_SMALL_FALLBACK and not _is_smooth_multiple(n)

def supports_plan(plan: FFTPlan) -> bool:
    if jax.dtypes.canonicalize_dtype(jnp.float32) != jnp.float32:
        return False
    n = plan.n if plan.kind == FFT_REAL else plan.cfft_n
    if _small_dispatch(n):  # direct-DFT matmul path
        return True
    if n < _MIN_SMALL:
        return False
    if n <= _MAX_N and _is_smooth_multiple(n):
        return True  # single Stockham kernel (fused real kernel: same bound)
    # Everything else runs as the two-level composite: kernel-sized factor
    # pairs above the single-kernel bound, and direct-DFT factor pairs for
    # the medium smooth sizes that are not multiples of 128 (576, 720, 960,
    # ... — parity with the reference serving its entire size domain from
    # the SIMD tier, common.hpp:216-225). Real plans additionally need both
    # factors even (the packed level-1 real transform and the level-2
    # Hermitian assembly both split a factor in half).
    return _has_composite_split(n, real=plan.kind == FFT_REAL)


def prefer_plan(plan: FFTPlan) -> bool:
    """Auto-dispatch preference: ``supports_plan`` minus the plans the metal
    engine is measured SLOWER on. Round-3 probe G (v5e): the medium smooth
    non-multiples of 128 above the direct-DFT fallback (576/960/1440/3600,
    two-level direct-DFT composites) run at 0.26–0.41x the portable
    engine's round-trip speed — per-factor direct-DFT matmuls with K<128
    waste the MXU and the two HBM round trips cost more than XLA's fused
    chain. Explicit ``engine="pallas"`` still serves them (full-domain
    parity with the reference SIMD tier, common.hpp:216-225); ``auto``
    takes the faster engine, like the reference's AVX-vs-SSE size gate."""
    if not supports_plan(plan):
        return False
    n = plan.n if plan.kind == FFT_REAL else plan.cfft_n
    return n <= _MAX_SMALL_FALLBACK or n % LANES == 0


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (the CI/test path — the
    analog of the reference exercising its SSE fallback on non-AVX CPUs,
    /root/reference/test/test.cpp:287-304)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Table construction (float64 -> float32, cached per (N, direction))
# ---------------------------------------------------------------------------


def _kernel_radices(n1: int) -> tuple[int, ...]:
    """Stage radices for the in-kernel Stockham: the plan's {4,2,3,5}
    factorization with the tail's power-of-two part re-packed into radix-8
    butterflies (fewer stages = fewer full passes over the VMEM working
    set; each stage costs a reshape/stack relayout + twiddle regardless of
    radix). The FIRST factor stays in {2,4} so the real-input
    specialization in _stockham_rows keeps applying."""
    from ..plans import factorize

    f = list(factorize(n1)) if n1 > 1 else []
    if not f:
        return ()
    first, rest = f[0], f[1:]
    two_exp = sum({2: 1, 4: 2}.get(r, 0) for r in rest)
    others = [r for r in rest if r not in (2, 4)]
    packed = [8] * (two_exp // 3)
    if two_exp % 3 == 2:
        packed.append(4)
    elif two_exp % 3 == 1:
        packed.append(2)
    return tuple([first] + packed + others)


@functools.lru_cache(maxsize=64)
def _tables(n: int, forward: bool):
    """Returns (stage_tw, main_tw, dft_mat) as numpy float32 re/im pairs.

    stage_tw: (S, N1, 128) — per-Stockham-stage twiddles for the N1-point
              FFTs, pre-expanded to the post-stage (N1,) row layout and
              broadcast across lanes so the kernel applies them as plain
              elementwise multiplies (Mosaic dislikes tiny reshapes of
              (r, m) tables inside the kernel; expanding host-side trades
              ~32KB of VMEM for shuffle-free vector ops).
    main_tw:  (N1, 128) — W_N^(k1 * n2) four-step twiddles.
    dft_mat:  (128, 128) — DFT matrix W_128^(n2 * k2).
    Backward tables are the conjugates (computed here so the kernel body
    stays sign-free).
    """
    n1 = n // LANES
    sgn = -1.0 if forward else 1.0

    # Stage twiddles for the N1 Stockham: mixed radices {8,4,2,3,5} — the
    # reference's {4,2,3,5} decompose() set (impl_common.hpp:51-82) with
    # the pow2 tail packed into radix-8 stages (see _kernel_radices).
    radices = list(_kernel_radices(n1))
    assert int(np.prod(radices) if radices else 1) == n1

    # Stage t multiplies the *post-butterfly, re-flattened* (N1,) rows:
    # row index = p*(r*s) + j*s + q (p in [0,m), j in [0,r), q in [0,s));
    # the factor is W_sub^(j*p) with sub = r*m the stage's sub-length.
    rows = []
    sub, s = n1, 1
    for r in radices:
        msub = sub // r
        row_idx = np.arange(n1, dtype=np.int64)
        idx_p = row_idx // (r * s)
        idx_j = (row_idx // s) % r
        ang = sgn * 2.0 * np.pi * (idx_j * idx_p) / float(sub)
        rows.append(np.cos(ang) + 1j * np.sin(ang))
        sub, s = msub, r * s
    stage = (
        np.broadcast_to(np.asarray(rows)[:, :, None], (len(rows), n1, LANES)).copy()
        if rows
        else np.zeros((1, n1, LANES), dtype=np.complex128)
    )

    k1 = np.arange(n1, dtype=np.float64)[:, None]
    n2 = np.arange(LANES, dtype=np.float64)[None, :]
    ang = sgn * 2.0 * np.pi * (k1 * n2) / float(n)
    main = np.cos(ang) + 1j * np.sin(ang)

    k2 = np.arange(LANES, dtype=np.float64)[None, :]
    ang = sgn * 2.0 * np.pi * (n2.T * k2) / float(LANES)
    dft = np.cos(ang) + 1j * np.sin(ang)

    def sp(z):
        return np.ascontiguousarray(z.real, np.float32), np.ascontiguousarray(z.imag, np.float32)

    return tuple(radices), sp(stage), sp(main), sp(dft)


@functools.lru_cache(maxsize=64)
def _tables_fwd_folded(n: int):
    """Forward tables with the four-step twiddle folded into the last
    Stockham stage's table. The last stage's own twiddle is identically 1
    (its p-index is always 0), so the fold removes one full elementwise
    complex multiply from the kernel at zero cost."""
    radices, (stw_re, stw_im), (mtw_re, mtw_im), dft = _tables(n, True)
    stw_re, stw_im = stw_re.copy(), stw_im.copy()
    lr = stw_re[-1] * mtw_re - stw_im[-1] * mtw_im
    li = stw_re[-1] * mtw_im + stw_im[-1] * mtw_re
    stw_re[-1], stw_im[-1] = lr, li
    return radices, (stw_re, stw_im), dft


@functools.lru_cache(maxsize=64)
def _rifft_tables(n: int):
    """Host-side tables for the fused inverse-real kernel.

    The Hermitian extension of the packed half spectrum is linear, so the
    lane-reversals it needs (Mosaic has no `rev` lowering) are folded into
    the merge matrices instead:

      u[k1] = v[k1] @ Mt  +  conj(v)[(N1-k1) % N1] @ Mbf   (+ row-0 fix)

    where Mt = M[:64] (direct half), Mbf = flip_rows(M[64:]) (extension
    half with the lane flip pre-applied); the k1 permutation is unrolled
    whole-tile slice moves in the kernel. Row 0's extension is shifted by
    one lane and carries Nyquist: its fix uses C[i] = Mb[64-i] (C[0] = 0)
    and Mb[0] (the Nyquist column).
    """
    radices, stw, mtw, (dft_re, dft_im) = _tables(n, False)
    half = LANES // 2
    mt = (dft_re[:half], dft_im[:half])  # (64, 128)
    mb_re, mb_im = dft_re[half:], dft_im[half:]  # (64, 128)
    mbf = (mb_re[::-1].copy(), mb_im[::-1].copy())
    c_re = np.zeros_like(mb_re)
    c_im = np.zeros_like(mb_im)
    c_re[1:] = mb_re[1:][::-1]  # C[i] = Mb[64-i], i in [1, 64)
    c_im[1:] = mb_im[1:][::-1]
    c0 = (mb_re[0:1].copy(), mb_im[0:1].copy())  # (1, 128) Nyquist column
    # Row-0 fix replaces the generic extension row: delta matrix = C - Mbf.
    d = (c_re - mbf[0], c_im - mbf[1])
    # Stacked merge matrix [Mt; Mbf]: one K=128 Karatsuba over the
    # lane-concatenated [v | conj(Pv)] operand — measured 30% faster than
    # two K=64 merges (K<128 matmuls underfill the systolic array).
    ms = (
        np.concatenate([mt[0], mbf[0]], axis=0),
        np.concatenate([mt[1], mbf[1]], axis=0),
    )
    return radices, stw, mtw, ms, d, c0


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd: bool,
                   drop_last_imag: bool = False):
    """Stockham FFT along axis 0 of (N1, TB, 128) value pairs.

    ``drop_last_imag`` (the real-inverse specialization, mirroring the
    forward's real-input first stage): the final stage's imaginary outputs
    are never consumed by irfft, and its stage twiddle is identically 1
    for non-folded tables (its p-index is always 0) — so the last stage
    emits only the real butterfly plane and skips the twiddle multiply.
    Only valid when the caller discards the imaginary result and the
    tables are NOT twiddle-folded (i.e. the backward direction).

    The butterflies are the TPU rendition of passf2/passf4
    (/root/reference/simd/chowdsp_fft_impl_sse.cpp:148-296): radix-4 with
    radix-2 cleanup. The (N1, TB, 128) layout is load-bearing: every slice,
    stack, and reshape here moves whole (TB, 128) vector-register tiles, so
    Mosaic lowers the stage dataflow to register moves instead of sublane
    shuffles (measured 13x faster than the (TB, N1, 128) orientation on
    v5e — see benchmarks/NOTES.md).
    """
    n1, tb, lanes = vre.shape
    n, s = n1, 1
    for t, r in enumerate(radices):
        m = n // r
        xr = vre.reshape(r, m * s, tb, lanes)
        pr = [xr[k] for k in range(r)]
        if vim is None and r not in (2, 4):
            # Real-input specialization only covers radix 2/4; for a
            # leading radix-3/5 stage, materialize the zero plane.
            vim = jnp.zeros_like(vre)
        if vim is None:
            # First stage on a purely-real input (the fused rfft): the
            # butterfly's imaginary outputs are 0 except the +/-i*(b-d)
            # terms of radix-4 — materializing the zero plane and its
            # multiplies would waste ~a third of the stage's VPU work.
            if r == 2:
                zz = jnp.zeros_like(pr[0])
                zr = [pr[0] + pr[1], pr[0] - pr[1]]
                zi = [zz, zz]
            else:
                t0r, t1r = pr[0] + pr[2], pr[0] - pr[2]
                t2r, dbr = pr[1] + pr[3], pr[1] - pr[3]
                zz = jnp.zeros_like(t0r)
                t3i = -dbr if sign_fwd else dbr
                zr = [t0r + t2r, t1r, t0r - t2r, t1r]
                zi = [zz, t3i, zz, -t3i]
        else:
            xi = vim.reshape(r, m * s, tb, lanes)
            pi = [xi[k] for k in range(r)]
            if r == 2:
                zr = [pr[0] + pr[1], pr[0] - pr[1]]
                zi = [pi[0] + pi[1], pi[0] - pi[1]]
            elif r == 4:  # t3 = -i*(b-d) fwd, +i*(b-d) bwd
                t0r, t0i = pr[0] + pr[2], pi[0] + pi[2]
                t1r, t1i = pr[0] - pr[2], pi[0] - pi[2]
                t2r, t2i = pr[1] + pr[3], pi[1] + pi[3]
                dbr, dbi = pr[1] - pr[3], pi[1] - pi[3]
                if sign_fwd:
                    t3r, t3i = dbi, -dbr  # -i * (b - d)
                else:
                    t3r, t3i = -dbi, dbr  # +i * (b - d)
                zr = [t0r + t2r, t1r + t3r, t0r - t2r, t1r - t3r]
                zi = [t0i + t2i, t1i + t3i, t0i - t2i, t1i - t3i]
            elif r == 8:
                # Radix-8 as two radix-4s + the ω^j = e^{∓2πij/8} combine:
                # y_j = A_j + ω^j B_j, y_{j+4} = A_j − ω^j B_j.
                def bf4(q0r, q0i, q1r, q1i, q2r, q2i, q3r, q3i):
                    t0r, t0i = q0r + q2r, q0i + q2i
                    t1r, t1i = q0r - q2r, q0i - q2i
                    t2r, t2i = q1r + q3r, q1i + q3i
                    dr_, di_ = q1r - q3r, q1i - q3i
                    if sign_fwd:
                        t3r, t3i = di_, -dr_
                    else:
                        t3r, t3i = -di_, dr_
                    return (
                        (t0r + t2r, t0i + t2i),
                        (t1r + t3r, t1i + t3i),
                        (t0r - t2r, t0i - t2i),
                        (t1r - t3r, t1i - t3i),
                    )

                A = bf4(pr[0], pi[0], pr[2], pi[2], pr[4], pi[4], pr[6], pi[6])
                Bv = bf4(pr[1], pi[1], pr[3], pi[3], pr[5], pi[5], pr[7], pi[7])
                c8 = 0.7071067811865476  # sqrt(2)/2
                sg = 1.0 if sign_fwd else -1.0
                # ω^j B_j for j = 0..3 (fwd: ω = (1 - i)/sqrt(2))
                wb = [Bv[0]]
                br_, bi_ = Bv[1]
                wb.append((c8 * (br_ + sg * bi_), c8 * (bi_ - sg * br_)))
                br_, bi_ = Bv[2]
                wb.append((sg * bi_, -sg * br_))
                br_, bi_ = Bv[3]
                wb.append((c8 * (sg * bi_ - br_), -c8 * (sg * br_ + bi_)))
                zr = [A[j][0] + wb[j][0] for j in range(4)] + [
                    A[j][0] - wb[j][0] for j in range(4)
                ]
                zi = [A[j][1] + wb[j][1] for j in range(4)] + [
                    A[j][1] - wb[j][1] for j in range(4)
                ]
            elif r == 3:  # the passf3_ps analog (sse:182-219)
                h3 = 0.8660254037844386  # sqrt(3)/2 = |sin(2*pi/3)|
                ur, ui = pr[1] + pr[2], pi[1] + pi[2]
                vr_, vi_ = pr[1] - pr[2], pi[1] - pi[2]
                m1r, m1i = pr[0] - 0.5 * ur, pi[0] - 0.5 * ui
                # z_{1,2} = m1 -/+ i*h3*v (fwd); conjugate for backward.
                if sign_fwd:
                    zr = [pr[0] + ur, m1r + h3 * vi_, m1r - h3 * vi_]
                    zi = [pi[0] + ui, m1i - h3 * vr_, m1i + h3 * vr_]
                else:
                    zr = [pr[0] + ur, m1r - h3 * vi_, m1r + h3 * vi_]
                    zi = [pi[0] + ui, m1i + h3 * vr_, m1i - h3 * vr_]
            else:  # r == 5: the passf5_ps analog (sse:298-370)
                tr11, ti11 = 0.30901699437494745, 0.9510565162951535
                tr12, ti12 = -0.8090169943749473, 0.5877852522924731
                u1r, u1i = pr[1] + pr[4], pi[1] + pi[4]
                u2r, u2i = pr[2] + pr[3], pi[2] + pi[3]
                v1r, v1i = pr[1] - pr[4], pi[1] - pi[4]
                v2r, v2i = pr[2] - pr[3], pi[2] - pi[3]
                m1r = pr[0] + tr11 * u1r + tr12 * u2r
                m1i = pi[0] + tr11 * u1i + tr12 * u2i
                m2r = pr[0] + tr12 * u1r + tr11 * u2r
                m2i = pi[0] + tr12 * u1i + tr11 * u2i
                s1r = ti11 * v1r + ti12 * v2r
                s1i = ti11 * v1i + ti12 * v2i
                s2r = ti12 * v1r - ti11 * v2r
                s2i = ti12 * v1i - ti11 * v2i
                sg = 1.0 if sign_fwd else -1.0
                # z_k = m -/+ i*s (fwd): re -/+ = +sg*s_i, im = -sg*s_r.
                zr = [
                    pr[0] + u1r + u2r,
                    m1r + sg * s1i,
                    m2r + sg * s2i,
                    m2r - sg * s2i,
                    m1r - sg * s1i,
                ]
                zi = [
                    pi[0] + u1i + u2i,
                    m1i - sg * s1r,
                    m2i - sg * s2r,
                    m2i + sg * s2r,
                    m1i + sg * s1r,
                ]
        # Interleave the r butterfly outputs back into (N1,) row order
        # (out row = p*(r*s) + j*s + q), then apply the stage twiddle as an
        # elementwise complex multiply broadcast over (TB, 128) tiles.
        zr = [z.reshape(m, s, tb, lanes) for z in zr]
        ar = jnp.stack(zr, axis=1).reshape(n1, tb, lanes)
        if drop_last_imag and t == len(radices) - 1:
            # Imag plane discarded by the caller; twiddle identically 1.
            vre, vim = ar, None
            n, s = m, r * s
            continue
        zi = [z.reshape(m, s, tb, lanes) for z in zi]
        ai = jnp.stack(zi, axis=1).reshape(n1, tb, lanes)
        wr = stw_re[t][:, None, :]  # (N1, 1, 128), broadcast over TB
        wi = stw_im[t][:, None, :]
        vre = ar * wr - ai * wi
        vim = ar * wi + ai * wr
        n, s = m, r * s
    return vre, vim


def _cfft_tile(
    xre,
    xim,
    stw_re,
    stw_im,
    mtw_re,
    mtw_im,
    dft_re,
    dft_im,
    *,
    n1: int,
    radices: tuple[int, ...],
    sign_fwd: bool,
    reverse_order: bool,
    ordered_io: bool = False,
):
    """Shared body of the complex kernel, one (TB, N) plane-pair tile:
    forward pipeline (Stockham -> twiddle -> MXU merge) or, with
    reverse_order=True, the mirrored inverse pipeline (MXU merge ->
    twiddle -> Stockham), which consumes the unordered (k1, k2) layout
    and emits natural time order.

    With ordered_io=True the frequency-domain side of the tile uses
    NATURAL bin order (k = k1 + n1*k2) instead of the engine-private
    (k1, k2) layout: the digit transpose is folded into the kernel as
    the same minor-2D-transpose chain the real kernel's to_plane uses
    (swap to batch-minor, reorder the now-major digits for free,
    transpose back) instead of a separate XLA transpose pass over HBM
    (~150us at B=1024/N=4096 — probe D, benchmarks/NOTES.md round 4)."""
    tb = xre.shape[0]
    lanes = LANES

    def from_plane_ordered(x):
        # (TB, N) natural bins -> (N1, TB, 128) engine layout. Minor 2D
        # transpose -> leading-dim expand (layout no-op) -> free major
        # swap -> minor transpose back to batch-major tiles.
        v = jnp.swapaxes(x, 0, 1).reshape(lanes, n1, tb)  # [k2, k1, t]
        return jnp.swapaxes(jnp.swapaxes(v, 0, 1), 1, 2)  # (n1, tb, 128)

    if reverse_order and ordered_io:
        vre = from_plane_ordered(xre)
        vim = from_plane_ordered(xim)
    else:
        # (TB, N) -> (N1, TB, 128): the batch-minor orientation keeps every
        # Stockham move at whole-vreg granularity; the two swapaxes cost
        # ~24us total at B=1024/N=4096 on v5e, vs ~220us saved in the stages.
        vre = jnp.swapaxes(xre.reshape(tb, n1, LANES), 0, 1)
        vim = jnp.swapaxes(xim.reshape(tb, n1, LANES), 0, 1)

    mtw_re = mtw_re[:, None, :]  # (N1, 1, 128)
    mtw_im = mtw_im[:, None, :]

    def merge_matmul(ar, ai):
        """(N1*TB, 128) x (128, 128) DFT along lanes, on the MXU
        (_merge_karatsuba: 3 real matmuls, fp32 HIGHEST — ~30% faster than
        the 4-matmul form at equal accuracy, err ~7e-6 at N=4096)."""
        yr, yi = _merge_karatsuba(ar, ai, dft_re, dft_im, n1 * tb)
        return yr.reshape(n1, tb, LANES), yi.reshape(n1, tb, LANES)

    def twiddle(ar, ai):
        return ar * mtw_re - ai * mtw_im, ar * mtw_im + ai * mtw_re

    if not reverse_order:
        # Four-step twiddle is pre-folded into the last stage table
        # (_tables_fwd_folded), so no explicit twiddle pass here.
        vre, vim = _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd)
        vre, vim = merge_matmul(vre, vim)
        if ordered_io:
            def to_plane_ordered(v):
                # (N1, TB, 128) -> (TB, N) natural: minor transpose ->
                # free major swap (bin k = k1 + n1*k2 becomes row-major)
                # -> leading collapse (no-op) -> transpose back.
                v = jnp.swapaxes(jnp.swapaxes(v, 1, 2), 0, 1)  # [k2, k1, t]
                return jnp.swapaxes(v.reshape(n1 * lanes, tb), 0, 1)

            return to_plane_ordered(vre), to_plane_ordered(vim)
    else:
        vre, vim = merge_matmul(vre, vim)
        vre, vim = twiddle(vre, vim)
        vre, vim = _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd)

    yre = jnp.swapaxes(vre, 0, 1).reshape(tb, n1 * LANES)
    yim = jnp.swapaxes(vim, 0, 1).reshape(tb, n1 * LANES)
    return yre, yim


def _fft_kernel(
    xre_ref,
    xim_ref,
    stw_re_ref,
    stw_im_ref,
    mtw_re_ref,
    mtw_im_ref,
    dft_re_ref,
    dft_im_ref,
    yre_ref,
    yim_ref,
    *,
    n1: int,
    radices: tuple[int, ...],
    sign_fwd: bool,
    reverse_order: bool,
    ordered_io: bool = False,
):
    """One batch tile of the complex pipeline (see _cfft_tile)."""
    yre_ref[...], yim_ref[...] = _cfft_tile(
        xre_ref[...], xim_ref[...],
        stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
        dft_re_ref[...], dft_im_ref[...],
        n1=n1, radices=radices, sign_fwd=sign_fwd, reverse_order=reverse_order,
        ordered_io=ordered_io,
    )


def _pallas_cfft_pair(
    xre: jax.Array,
    xim: jax.Array,
    n: int,
    forward: bool,
    reverse_order: bool,
    ordered_io: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Run the kernel over (B, N) float32 planes. Batch is padded to the
    tile size; tables ride along as replicated inputs."""
    n1 = n // LANES
    if not reverse_order:
        radices, (stw_re, stw_im), (dft_re, dft_im) = _tables_fwd_folded(n)
        if not forward:
            raise AssertionError("forward pipeline requires forward tables")
        # mtw unused on the folded-forward path; pass 1x128 dummies.
        mtw_re = np.ones((n1, LANES), np.float32)
        mtw_im = np.zeros((n1, LANES), np.float32)
    else:
        radices, (stw_re, stw_im), (mtw_re, mtw_im), (dft_re, dft_im) = _tables(n, forward)

    b = xre.shape[0]
    tb = _batch_tile(n, b)
    pad = (-b) % tb
    if pad:
        xre = jnp.pad(xre, ((0, pad), (0, 0)))
        xim = jnp.pad(xim, ((0, pad), (0, 0)))
    bp = b + pad

    num_stages = stw_re.shape[0]
    stw_re = jnp.asarray(stw_re)
    stw_im = jnp.asarray(stw_im)

    kern = functools.partial(
        _fft_kernel,
        n1=n1,
        radices=radices,
        sign_fwd=forward,
        reverse_order=reverse_order,
        ordered_io=ordered_io,
    )

    batch_spec = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    flops_mm = 8 * bp * n1 * LANES * LANES
    flops_bf = int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2
    yre, yim = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            batch_spec,
            batch_spec,
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
            table((n1, LANES)),
            table((n1, LANES)),
            table((LANES, LANES)),
            table((LANES, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + flops_bf,
            bytes_accessed=4 * (4 * bp * n),
            transcendentals=0,
        ),
        # In/out BlockSpecs are identical, so each grid step rewrites
        # exactly the pages it just read — safe to alias (see _ALIAS_KERNELS).
        input_output_aliases=_alias_io() or {},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(xre, xim, stw_re, stw_im, mtw_re, mtw_im, dft_re, dft_im)

    if pad:
        yre, yim = yre[:b], yim[:b]
    return yre, yim


def _cfft_db_kernel(
    xre_hbm,
    xim_hbm,
    stw_re_ref,
    stw_im_ref,
    mtw_re_ref,
    mtw_im_ref,
    dft_re_ref,
    dft_im_ref,
    yre_hbm,
    yim_hbm,
    inbuf,
    outbuf,
    in_sem,
    out_sem,
    *,
    n1: int,
    radices: tuple[int, ...],
    sign_fwd: bool,
    reverse_order: bool,
    tb: int,
    nchunks: int,
):
    """Double-buffered twin of _fft_kernel (see _rfft_db_kernel). The two
    planes share (2, 2, TB, N) scratch buffers — slot-major, plane-minor —
    so each direction needs one semaphore pair per slot, indexed [slot,
    plane]."""
    n = n1 * LANES

    def in_dmas(slot, i):
        return (
            pltpu.make_async_copy(
                xre_hbm.at[pl.ds(i * tb, tb), :], inbuf.at[slot, 0],
                in_sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                xim_hbm.at[pl.ds(i * tb, tb), :], inbuf.at[slot, 1],
                in_sem.at[slot, 1],
            ),
        )

    def out_dmas(slot, i):
        return (
            pltpu.make_async_copy(
                outbuf.at[slot, 0], yre_hbm.at[pl.ds(i * tb, tb), :],
                out_sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                outbuf.at[slot, 1], yim_hbm.at[pl.ds(i * tb, tb), :],
                out_sem.at[slot, 1],
            ),
        )

    for dma in in_dmas(0, 0):
        dma.start()

    def step(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            for dma in in_dmas(jax.lax.rem(i + 1, 2), i + 1):
                dma.start()

        for dma in in_dmas(slot, i):
            dma.wait()
        yre, yim = _cfft_tile(
            inbuf[slot, 0], inbuf[slot, 1],
            stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
            dft_re_ref[...], dft_im_ref[...],
            n1=n1, radices=radices, sign_fwd=sign_fwd,
            reverse_order=reverse_order,
        )

        @pl.when(i >= 2)
        def _():
            for dma in out_dmas(slot, i - 2):
                dma.wait()

        outbuf[slot, 0] = yre
        outbuf[slot, 1] = yim
        for dma in out_dmas(slot, i):
            dma.start()
        return carry

    jax.lax.fori_loop(0, nchunks, step, None)
    if nchunks >= 2:
        for dma in out_dmas((nchunks - 2) % 2, nchunks - 2):
            dma.wait()
    for dma in out_dmas((nchunks - 1) % 2, nchunks - 1):
        dma.wait()


def _cfft_pair_db(
    xre: jax.Array,
    xim: jax.Array,
    n: int,
    forward: bool,
    reverse_order: bool,
) -> tuple[jax.Array, jax.Array]:
    """Double-buffered twin of _pallas_cfft_pair (probe queue section I
    decides dispatch)."""
    n1 = n // LANES
    if not reverse_order:
        radices, (stw_re, stw_im), (dft_re, dft_im) = _tables_fwd_folded(n)
        if not forward:
            raise AssertionError("forward pipeline requires forward tables")
        mtw_re = np.ones((n1, LANES), np.float32)
        mtw_im = np.zeros((n1, LANES), np.float32)
    else:
        radices, (stw_re, stw_im), (mtw_re, mtw_im), (dft_re, dft_im) = _tables(n, forward)

    b = xre.shape[0]
    tb = _batch_tile(n, b)
    pad = (-b) % tb
    if pad:
        xre = jnp.pad(xre, ((0, pad), (0, 0)))
        xim = jnp.pad(xim, ((0, pad), (0, 0)))
    bp = b + pad
    nchunks = bp // tb

    kern = functools.partial(
        _cfft_db_kernel, n1=n1, radices=radices, sign_fwd=forward,
        reverse_order=reverse_order, tb=tb, nchunks=nchunks,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_mm = 8 * bp * n1 * LANES * LANES
    flops_bf = int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2
    yre, yim = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [vmem] * 6,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, tb, n), jnp.float32),
            pltpu.VMEM((2, 2, tb, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_mm + flops_bf,
            bytes_accessed=4 * (4 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(xre, jnp.float32), jnp.asarray(xim, jnp.float32),
      jnp.asarray(stw_re), jnp.asarray(stw_im), mtw_re, mtw_im,
      dft_re, dft_im)

    if pad:
        yre, yim = yre[:b], yim[:b]
    return yre, yim


# ---------------------------------------------------------------------------
# Fused real-transform kernels (direct real-input four-step)
#
# The reference reaches real transforms through a half-length complex FFT
# plus the radf*/radb* + real_finalize/preprocess machinery
# (/root/reference/simd/chowdsp_fft_impl_sse.cpp:552-1078). On TPU the
# stride-2 de/interleave that scheme needs is a lane-granularity shuffle —
# exactly what Mosaic is worst at — while HBM bandwidth, not FLOPs, is the
# binding constraint. So the TPU-native design runs the FULL-length four-step
# directly on the real input (imag plane identically zero inside the kernel:
# zero HBM cost, modest extra VPU work) and exploits Hermitian symmetry on
# the *output* side instead: the MXU merge uses a (128, 64) half-DFT matrix,
# the Nyquist bin is a single alternating-sign lane reduction, and only the
# N/2 packed bins ever travel back to HBM. Total traffic = N·f32 in +
# N·f32 out per row — the memory-bound speed of light for an rfft.
#
# Output layout is the SoA rendition of pffft's packed real spectrum
# (/root/reference/chowdsp_fft_juce/chowdsp_fft_juce.cpp:48-61 documents the
# original): re[k] = Re X[k], im[k] = Im X[k] for k in [1, N/2), re[0] = DC,
# im[0] = Nyquist (both purely real). `ordered=False` keeps the engine's
# digit-transposed bin order (k = k1 + N1*k2 stored at k1*64 + k2) — the
# analog of fft_transform_unordered — which the inverse kernel and the
# packed convolve consume directly.
# ---------------------------------------------------------------------------


# MXU merge precision knob. "highest" = fp32 via the 6-pass HIGHEST
# emulation — the only mode meeting the reference's 2e-7*N error bound
# (/root/reference/test/test.cpp:9-14). "bf16x3" = manual two-way bf16
# split, 3 single-pass matmuls per real product (~2x merge speedup,
# absolute error ~1e-3 at N=4096 unit-variance input — OVER the reference
# bound; opt-in for error-tolerant pipelines).
#
# The mode rides jax.default_matmul_precision — a config that IS in the
# native jit cache key — so a jitted transform called under a different
# mode MISSES the jit cache and retraces; a compiled "highest" kernel can
# never be silently reused under "bf16x3" or vice versa. (Before this,
# the mode was a plain module global read at trace time — a cache footgun
# flagged in round 2. A library-private config state was tried first:
# jax._src.config.enum_state(include_in_jit_key=True) is silently
# ignored for states created after jaxlib snapshots its native jit-key
# config set, so only a built-in config can carry the mode.)
#
# Mapping: ambient matmul precisions that already authorize bf16-level
# MXU passes select the fast merge; everything f32-grade or stricter
# (including None/default — the reference's accuracy bound is the
# contract) selects the compliant 6-pass merge.
_BF16_GRADE_PRECISIONS = frozenset(
    ["bfloat16", "BF16_BF16_BF16", "BF16_BF16_F32", "BF16_BF16_F32_X3"]
)


def _merge_mode() -> str:
    val = jax._src.config.config._read("jax_default_matmul_precision")
    return "bf16x3" if val in _BF16_GRADE_PRECISIONS else "highest"


def merge_precision(mode: str):
    """Context manager selecting the MXU merge mode ("highest" | "bf16x3")
    for kernels run/traced inside the context. The TPU analog of the
    reference's use_avx_if_available runtime flag
    (/root/reference/chowdsp_fft.h:92-96): an explicit speed/accuracy
    trade the caller opts into, with the compliant mode as default.

    Implemented as ``jax.default_matmul_precision('BF16_BF16_F32_X3')``
    (resp. ``'highest'``), which participates in the jit cache key:
    calling one jitted function under both modes compiles (and returns)
    both variants instead of silently reusing a stale kernel. Side
    effect, by design: other matmuls without an explicit ``precision=``
    inside the context follow the same ambient precision. Conversely, a
    caller already running under a bf16-grade
    ``jax.default_matmul_precision`` gets the fast merge without this
    wrapper."""
    if mode not in ("highest", "bf16x3"):
        raise ValueError(f"unknown merge precision {mode!r}")
    carrier = "BF16_BF16_F32_X3" if mode == "bf16x3" else "highest"
    return jax.default_matmul_precision(carrier)


def _dot_bf16x3(a, m):
    """f32-accurate-ish matmul from 3 single-pass bf16 MXU matmuls: split
    both operands hi/lo (8+8 mantissa bits) and drop only the lo*lo term.
    Error floor ~2^-16 relative (the two-way-split floor — see
    benchmarks/NOTES.md; DotAlgorithmPreset is not lowerable in Mosaic)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    m_hi = m.astype(jnp.bfloat16)
    m_lo = (m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # precision pinned so the ambient default_matmul_precision (the mode
    # carrier — see merge_precision) can't morph these bf16 passes.
    dot = functools.partial(
        jnp.dot,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return dot(a_hi, m_hi) + (dot(a_lo, m_hi) + dot(a_hi, m_lo))


def _merge_dot(a, m):
    if _merge_mode() == "bf16x3":
        return _dot_bf16x3(a, m)
    return jnp.dot(
        a, m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )


def _merge_karatsuba(ar, ai, mr, mi, rows: int, k: int = LANES):
    """Complex matmul along lanes via 3 real MXU matmuls (mode: see
    merge_precision)."""
    a2r = ar.reshape(rows, k)
    a2i = ai.reshape(rows, k)
    p1 = _merge_dot(a2r, mr)
    p2 = _merge_dot(a2i, mi)
    p3 = _merge_dot(a2r + a2i, mr + mi)
    return p1 - p2, p3 - p1 - p2


def _rfft_tile(
    x,
    stw_re,
    stw_im,
    msf,
    msg,
    alt,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
):
    """Shared body of the fused real forward: one (TB, N) f32 tile ->
    packed half-spectrum planes ((TB, N/2), (TB, N/2)). Used by both the
    grid-pipelined kernel (_rfft_kernel) and the manually double-buffered
    variant (_rfft_db_kernel)."""
    tb = x.shape[0]
    half = LANES // 2
    vre = jnp.swapaxes(x.reshape(tb, n1, LANES), 0, 1)
    vre, vim = _stockham_rows(vre, None, radices, stw_re, stw_im, True)

    # Nyquist = X[N/2] (k1=0, k2=64): alternating-sign lane reduction of the
    # k1=0 row (W_128^{-64*n2} = (-1)^n2; the result is purely real). The
    # folded twiddle for k1=0 is identically 1, so post-stage == post-twiddle.
    nyq = jnp.sum(vre[0] * alt, axis=-1)  # (TB,)

    # Column-packed half merge: bins k = k1 + N1*k2 for k2 in [0, 64).
    # MXU time at these shapes scales with rows x passes and is INDEPENDENT
    # of output columns <= 128 (measured: the 64-col Karatsuba ran at the
    # full-width rate — benchmarks/ROOFLINE.md cost model), so instead of 3
    # Karatsuba matmuls with half-empty output lanes, TWO full-width
    # matmuls compute the joint [y_r | y_i] lane layout directly:
    #   u = a_r @ [Mr | Mi],  w = a_i @ [-Mi | Mr],  j = u + w
    # The lane-halves split is deferred past the flatten's minor transpose,
    # where it becomes a free sublane-range slice.
    rows = n1 * tb
    u = _merge_dot(vre.reshape(rows, LANES), msf)
    w = _merge_dot(vim.reshape(rows, LANES), msg)
    j = (u + w).reshape(n1, tb, LANES)

    j2 = jnp.swapaxes(j, 1, 2)  # (n1, 128, tb): minor 2D transpose
    yr = j2[:, :half, :]  # (n1, 64, tb) — sublane slices, whole-vreg moves
    yi = j2[:, half:, :]

    def to_plane(a):
        # (for natural bin order) major swap -> leading-dim collapse
        # (layout no-op) -> one full 2D transpose back to batch-major.
        # (Mosaic cannot reshape across a sub-128-lane minor pair.)
        if ordered:
            a = jnp.swapaxes(a, 0, 1)  # (64, n1, tb): bin k = k1 + n1*k2
        return jnp.swapaxes(a.reshape(n1 * half, tb), 0, 1)  # (tb, m)

    yr2 = to_plane(yr)
    yi2 = to_plane(yi)
    # Pack Nyquist into im[0] (bin 0 sits at index 0 in both orders; its
    # imaginary part is zero by symmetry so the slot is free — same packing
    # trick as pffft, /root/reference/simd/chowdsp_fft_impl_sse.cpp:1640-1644).
    col = jax.lax.broadcasted_iota(jnp.int32, yi2.shape, 1)
    yi2 = jnp.where(col == 0, nyq[:, None], yi2)
    return yr2, yi2


def _rfft_kernel(
    x_ref,
    stw_re_ref,
    stw_im_ref,
    msf_ref,
    msg_ref,
    alt_ref,
    yre_ref,
    yim_ref,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
):
    """Real forward: x (TB, N) f32 -> packed half-spectrum planes (TB, N/2).

    Stage tables arrive pre-folded with the four-step twiddle
    (_tables_fwd_folded) and the first stage runs real-specialized
    (vim=None in _stockham_rows)."""
    yr2, yi2 = _rfft_tile(
        x_ref[...], stw_re_ref[...], stw_im_ref[...],
        msf_ref[...], msg_ref[...], alt_ref[...],
        n1=n1, radices=radices, ordered=ordered,
    )
    if yim_ref is None:  # joint output: [re | im] in one (TB, N) buffer
        m = yr2.shape[-1]
        yre_ref[:, :m] = yr2
        yre_ref[:, m:] = yi2
    else:
        yre_ref[...] = yr2
        yim_ref[...] = yi2


def _irfft_kernel(
    yre_ref,
    yim_ref,
    stw_re_ref,
    stw_im_ref,
    mtw_re_ref,
    mtw_im_ref,
    ms_re_ref,
    ms_im_ref,
    d_re_ref,
    d_im_ref,
    c0_re_ref,
    c0_im_ref,
    x_ref,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
):
    """Real backward (unscaled): packed planes (TB, N/2) -> x (TB, N) f32.

    Mirrors the forward. The Hermitian extension of the half spectrum to
    the full 128 merge bins is linear, so it is folded into the merge
    matmuls (see _rifft_tables) — Mosaic has no lane-reverse lowering, and
    a physical extension would double the merge input anyway:

      u = [v | conj(Pv)] @ [Mt; Mbf] + row0: [conj(v0) @ D + nyq * c0]

    (one K=128 Karatsuba; P is the k1 -> (N1-k1) % N1 reversal, applied as
    unrolled whole-tile slice moves). Then conj twiddle -> backward
    Stockham -> natural time order. The output's imaginary plane cancels
    analytically and never touches HBM.
    """
    tb = yre_ref.shape[0]
    xr = _irfft_core(
        yre_ref[...], yim_ref[...],
        stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
        ms_re_ref[...], ms_im_ref[...], d_re_ref[...], d_im_ref[...],
        c0_re_ref[...], c0_im_ref[...],
        n1=n1, radices=radices, ordered=ordered,
    )
    x_ref[...] = jnp.swapaxes(xr, 0, 1).reshape(tb, n1 * LANES)


def _irfft_core(
    yre, yim, stw_re, stw_im, mtw_re, mtw_im, ms_re, ms_im,
    d_re, d_im, c0_re, c0_im, *, n1: int, radices: tuple[int, ...], ordered: bool,
):
    """Shared body of the fused real inverse: packed planes (rows, N/2) ->
    natural-time (n1, rows, 128) values (callers lay out the output)."""
    tb = yre.shape[0]
    half = LANES // 2

    def from_plane(p):
        # Mirror of the forward's flatten chain (see _rfft_kernel).
        u = jnp.swapaxes(p, 0, 1)  # (m, tb)
        if ordered:
            u = jnp.swapaxes(u.reshape(half, n1, tb), 0, 1)  # (n1, 64, tb)
        else:
            u = u.reshape(n1, half, tb)
        return jnp.swapaxes(u, 1, 2)  # (n1, tb, 64)

    vre = from_plane(yre)
    vim = from_plane(yim)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tb, half), 2)
    nyq = vim[0:1, :, 0:1]  # (1, TB, 1) — X[N/2], stashed in im[0]
    vim0 = jnp.where(lane == 0, 0.0, vim[0:1])  # true Im X[0] = 0
    vim = jnp.concatenate([vim0, vim[1:]], axis=0)

    # Hermitian half-row merge: the output x is real, and the Stockham
    # stages act as independent inverse length-N1 FFTs over k1 (one per
    # q2 lane), so their input w = twiddle(merge(v)) must be Hermitian
    # along k1: w[k1]* = w[(N1-k1) % N1]. The merge + twiddle therefore
    # only COMPUTE rows k1 = 0..N1//2; the remaining rows are an exact
    # conjugate mirror (whole-tile slice moves + one negation), cutting
    # the dominant 3-matmul fp32-HIGHEST Karatsuba from N1 to N1//2+1
    # rows — the structural reason the inverse used to run ~35% behind
    # the forward (round-4 probe C; the forward's half-spectrum merge
    # was always row-minimal). Mirrors the reference's rfftb, which also
    # does half-spectrum-sized work throughout (sse:1358-1416).
    nc = n1 // 2 + 1  # computed rows 0..n1//2 (self-paired ends)
    rows = nc * tb

    def perm_half(a):
        # rows (N1 - k1) % N1 for k1 = 0..nc-1: [a[0], a[n1-1], ..., a[n1-nc+1]]
        return jnp.concatenate(
            [a[0:1]] + [a[n1 - i : n1 - i + 1] for i in range(1, nc)], axis=0
        )

    # One stacked K=128 Karatsuba over the computed rows: [v | conj(Pv)].
    ar = jnp.concatenate([vre[:nc], perm_half(vre)], axis=2)
    ai = jnp.concatenate([vim[:nc], -perm_half(vim)], axis=2)
    ur, ui = _merge_karatsuba(ar, ai, ms_re, ms_im, rows, k=LANES)
    ur = ur.reshape(nc, tb, LANES)
    ui = ui.reshape(nc, tb, LANES)
    # Row-0 fix: generic extension row -> lane-shifted row + Nyquist column.
    fr, fi = _merge_karatsuba(vre[0:1], -vim[0:1], d_re, d_im, tb, k=half)
    fr = fr.reshape(1, tb, LANES) + nyq * c0_re[None]
    fi = fi.reshape(1, tb, LANES) + nyq * c0_im[None]
    ur = jnp.concatenate([ur[0:1] + fr, ur[1:]], axis=0)
    ui = jnp.concatenate([ui[0:1] + fi, ui[1:]], axis=0)

    # NB: slice and expand_dims as two steps — the combined `[:nc, None, :]`
    # form routes through jnp's gather path, which Mosaic rejects on TPU
    # ("Shape mismatch in input, indices and output"; interpret mode hides it).
    mtw_re = jnp.expand_dims(mtw_re[:nc], 1)
    mtw_im = jnp.expand_dims(mtw_im[:nc], 1)
    wr, wi = ur * mtw_re - ui * mtw_im, ur * mtw_im + ui * mtw_re
    if n1 > nc:
        # Mirror rows nc..n1-1: w[k1] = conj(w[n1-k1]).
        mir = [wr[j : j + 1] for j in range(n1 - nc, 0, -1)]
        wr = jnp.concatenate([wr] + mir, axis=0)
        mii = [wi[j : j + 1] for j in range(n1 - nc, 0, -1)]
        wi = jnp.concatenate([wi] + [-m for m in mii], axis=0)
    xr, _ = _stockham_rows(
        wr, wi, radices, stw_re, stw_im, False, drop_last_imag=True
    )
    return xr


def _rbatch_tile(n: int, b: int) -> int:
    """Batch tile for the fused real kernels. Swept on v5e: constant
    tb*N ~ 2^18 elements wins (tb=64 at N=4096: 137us vs 155/208 at
    128/256; tb=256 at N=1024: 260us roundtrip vs 335 at 64 — bigger
    tiles amortize per-grid-step overhead at smaller N), capped at 256
    rows and by scoped VMEM."""
    b8 = -(-b // 8) * 8  # don't pad tiny batches up to a huge tile
    # Swept on v5e with the column-packed merge (NOTES.md round 2):
    # tb*N ~ 2^19 elements wins at kernel sizes <= 2^13 — 2^12: 128 (125
    # vs 137us fwd), 2^13: 64 (+17%). Round-3 probe A (N=512 B=8192 fwd):
    # 512 rows 106.7us vs 256 rows 111.9us — per-grid-step overhead still
    # dominates at the smallest kernel sizes, so let the tile keep
    # growing there. Round-4/5 tile probes (row-carry harness,
    # scratch/r5_tile_probe*.py): the optimum GROWS with N — 2^14: 64
    # beats 32 by 13-30% (256 loses), 2^15: 32/64/128 all ~equal and
    # ~1.3x over 16, >= 2^16: the 2^19 law collapses (2^16 tb=16 at 13.1
    # vs tb=64 at 27.1 Gs/s, 2.1x; 2^17 tb=32 +34% over 16) — take the
    # whole batch up to a 16 MB (2^22-element) input tile there.
    cap = 512 if n <= 512 else 256
    if n < (1 << 14):
        t_n = (1 << 19) // n
    elif n < (1 << 16):
        t_n = 64
    else:
        t_n = (1 << 22) // n
    tb = max(16, t_n)
    tb = max(8, min(cap, tb, b8))
    return (tb // 8) * 8


def _halfspec_weight(re: jax.Array, im: jax.Array, n: int, w_pair: float):
    """Adjoint weighting between packed planes and the time domain: the
    DC and Nyquist slots (both at column 0) represent one real bin each
    (weight 1); every other slot stands for a conjugate PAIR of bins —
    weight 1/2 transposing the forward, 2 transposing the inverse (the
    two weights must be reciprocal so that vjp(irfft . rfft) = N * ct)."""
    col = jax.lax.broadcasted_iota(jnp.int32, re.shape, re.ndim - 1)
    w = jnp.where(col == 0, 1.0, w_pair)
    return re * w, im * w


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pallas_rfft_packed(x, n, ordered):
    """Fused real forward with an exact adjoint rule: the transpose of the
    packed rfft is the packed irfft of the half-weighted cotangent (DC and
    Nyquist carry weight 1, paired bins 1/2) — same ordering flag."""
    return _pallas_rfft_packed_impl(x, n, ordered)


def _pallas_rfft_packed_fwd(x, n, ordered):
    return _pallas_rfft_packed_impl(x, n, ordered), None


def _pallas_rfft_packed_bwd(n, ordered, _res, ct):
    sre, sim = _halfspec_weight(ct[0], ct[1], n, 0.5)
    return (_pallas_irfft_packed_impl(sre, sim, n, ordered),)


_pallas_rfft_packed.defvjp(_pallas_rfft_packed_fwd, _pallas_rfft_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pallas_irfft_packed(yre, yim, n, ordered):
    """Fused real backward; adjoint = half-weighted packed forward."""
    return _pallas_irfft_packed_impl(yre, yim, n, ordered)


def _pallas_irfft_packed_fwd(yre, yim, n, ordered):
    return _pallas_irfft_packed_impl(yre, yim, n, ordered), None


def _pallas_irfft_packed_bwd(n, ordered, _res, ct):
    re, im = _pallas_rfft_packed_impl(ct, n, ordered)
    return _halfspec_weight(re, im, n, 2.0)


_pallas_irfft_packed.defvjp(_pallas_irfft_packed_fwd, _pallas_irfft_packed_bwd)


def _pallas_rfft_packed_impl(
    x: jax.Array, n: int, ordered: bool, joint: bool = False
):
    """(B, N) f32 -> packed half-spectrum planes ((B, N/2), (B, N/2)) f32.

    ``joint=True`` returns ONE (B, N) buffer holding [re | im] instead —
    written directly by the kernel, so chains that keep the planes together
    (bench loops, spectra stored as one tensor) pay zero relayout."""
    if _small_dispatch(n):
        assert not joint
        return _small_rfft_packed(jnp.asarray(x, jnp.float32), n)
    n1 = n // LANES
    radices, (stw_re, stw_im), (dft_re, dft_im) = _tables_fwd_folded(n)
    half = LANES // 2
    alt = dft_re[:, LANES // 2].reshape(1, LANES).copy()  # (-1)^n2

    b = x.shape[0]
    tb = _rbatch_tile(n, b)
    pad = (-b) % tb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bp = b + pad
    num_stages = stw_re.shape[0]

    # Column-packed merge matrices (see _rfft_kernel): [Mr|Mi], [-Mi|Mr].
    # (A batch-paired variant — complex stages on half the rows via the
    # two-for-one trick — measured SLOWER: 182 vs 141 us at N=4096/B=1024;
    # the Zrev operand row-moves and doubled flatten transposes cost more
    # than the halved stage work. See benchmarks/NOTES.md round 2.)
    msf = np.concatenate([dft_re[:, :half], dft_im[:, :half]], axis=1)
    msg = np.concatenate([-dft_im[:, :half], dft_re[:, :half]], axis=1)
    kern = functools.partial(_rfft_kernel, n1=n1, radices=radices, ordered=ordered)
    extra_tables = (msf, msg, alt)
    extra_specs = [(LANES, LANES)] * 2 + [(1, LANES)]
    if joint:
        kern = functools.partial(kern, yim_ref=None)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    m = n // 2
    if joint:
        out_specs = [pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((bp, n), jnp.float32)]
    else:
        out_specs = [
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((bp, m), jnp.float32),
            jax.ShapeDtypeStruct((bp, m), jnp.float32),
        ]
    outs = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
        ]
        + [table(s) for s in extra_specs],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * n1 * LANES * LANES
            + int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(x, jnp.float32), stw_re, stw_im, *extra_tables)

    if joint:
        (y,) = outs
        return y[:b] if pad else y
    yre, yim = outs
    if pad:
        yre, yim = yre[:b], yim[:b]
    return yre, yim


def _rfft_cols_kernel(
    x_ref,
    stw_re_ref,
    stw_im_ref,
    msf_ref,
    msg_ref,
    alt_ref,
    yre_ref,
    yim_ref,
    *,
    n1: int,
    radices: tuple[int, ...],
):
    """Column-blocked real forward for the composite's level 1: the block
    is (B, A, TC) — TC stride-C subsequences of every batch row, read
    STRAIGHT from the untransposed (B, A, C) array (the transpose that
    used to be a standalone XLA pass happens as an in-VMEM minor relayout
    here). Output block (B, TC, A/2) lands directly in the (B, C, A/2)
    layout the composite's twiddle step consumes. The grid is 1-D over
    column tiles with the batch folded into the block: a 2-D grid with
    leading-1 blocks sent the Mosaic compile time to 199s (vs 10s for
    this form — NOTES.md round 2)."""
    bb, _, tc = x_ref.shape
    half = LANES // 2
    xs = x_ref[...]
    vre = jnp.swapaxes(xs.reshape(bb, n1, LANES, tc), 0, 1)  # (n1, b, 128, tc)
    vre = jnp.swapaxes(vre, 2, 3).reshape(n1, bb * tc, LANES)
    vre, vim = _stockham_rows(vre, None, radices, stw_re_ref[...], stw_im_ref[...], True)
    nyq = jnp.sum(vre[0] * alt_ref[...], axis=-1)  # (b*tc,)
    rows = n1 * bb * tc
    u = _merge_dot(vre.reshape(rows, LANES), msf_ref[...])
    w = _merge_dot(vim.reshape(rows, LANES), msg_ref[...])
    j = (u + w).reshape(n1, bb * tc, LANES)
    j2 = jnp.swapaxes(j, 1, 2)  # (n1, 128, b*tc)
    m = n1 * half
    yr = jnp.swapaxes(j2[:, :half, :], 0, 1)  # (64, n1, b*tc): ordered bins
    yi = jnp.swapaxes(j2[:, half:, :], 0, 1)
    yr2 = jnp.swapaxes(yr.reshape(m, bb * tc), 0, 1).reshape(bb, tc, m)
    yi2 = jnp.swapaxes(yi.reshape(m, bb * tc), 0, 1).reshape(bb, tc, m)
    col = jax.lax.broadcasted_iota(jnp.int32, yi2.shape, 2)
    yi2 = jnp.where(col == 0, nyq.reshape(bb, tc)[..., None], yi2)
    yre_ref[...] = yr2
    yim_ref[...] = yi2


def _col_tile(a: int, c: int, b: int) -> int:
    """Column tile: block is (B, A, TC) so TC scales down with B*A; must
    divide C and be >= 128 (Mosaic requires the minor block dim be a
    multiple of 128 or the whole axis)."""
    tc = max(128, min(256, (1 << 19) // (b * a)))
    while c % tc:
        tc //= 2
    return tc


def _cols_supported(b: int, a: int, c: int) -> bool:
    """The batch-folded block must fit VMEM comfortably (and the column
    kernel exists only for Stockham-form A — direct-DFT levels use the
    explicit-transpose branch)."""
    if not _is_smooth_multiple(a):
        return False
    tc = _col_tile(a, c, b)
    return tc >= 128 and c % tc == 0 and b * a * tc * 4 <= _V2_BLOCK_BYTES


def _rfft_packed_cols_impl(x3: jax.Array, a: int) -> tuple[jax.Array, jax.Array]:
    """(B, A, C) f32 -> packed planes of the length-A rfft of every
    stride-C subsequence, laid out (B, C, A/2) (the composite level-1
    shape) — no standalone transpose pass."""
    b, a_, c = x3.shape
    assert a_ == a
    n1 = a // LANES
    radices, (stw_re, stw_im), (dft_re, dft_im) = _tables_fwd_folded(a)
    half = LANES // 2
    msf = np.concatenate([dft_re[:, :half], dft_im[:, :half]], axis=1)
    msg = np.concatenate([-dft_im[:, :half], dft_re[:, :half]], axis=1)
    alt = dft_re[:, LANES // 2].reshape(1, LANES).copy()
    num_stages = stw_re.shape[0]
    tc = _col_tile(a, c, b)
    m = a // 2

    kern = functools.partial(_rfft_cols_kernel, n1=n1, radices=radices)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda k, z=zeros: z, memory_space=pltpu.VMEM)

    yre, yim = pl.pallas_call(
        kern,
        grid=(c // tc,),
        in_specs=[
            pl.BlockSpec((b, a, tc), lambda k: (0, 0, k), memory_space=pltpu.VMEM),
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
            table((LANES, LANES)),
            table((LANES, LANES)),
            table((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((b, tc, m), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, m), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, m), jnp.float32),
            jax.ShapeDtypeStruct((b, c, m), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * c * n1 * LANES * LANES
            + int(2.5 * b * c * a * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * b * c * a),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(x3, jnp.float32), stw_re, stw_im, msf, msg, alt)
    return yre, yim


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _rfft_packed_cols(x3, a):
    """Column-blocked level-1 forward with an exact adjoint (the packed
    irfft of the half-weighted cotangent, transposed back to (B, A, C) —
    the backward pass pays the explicit transposes the forward fuses)."""
    return _rfft_packed_cols_impl(x3, a)


def _rfft_packed_cols_fwd(x3, a):
    return _rfft_packed_cols_impl(x3, a), None


def _rfft_packed_cols_bwd(a, _res, ct):
    b, c, m = ct[0].shape
    sre, sim = _halfspec_weight(ct[0], ct[1], a, 0.5)
    xt = _pallas_irfft_packed_impl(sre.reshape(b * c, m), sim.reshape(b * c, m), a, True)
    return (jnp.swapaxes(xt.reshape(b, c, a), 1, 2),)


_rfft_packed_cols.defvjp(_rfft_packed_cols_fwd, _rfft_packed_cols_bwd)


def _irfft_cols_kernel(
    yre_ref, yim_ref, stw_re_ref, stw_im_ref, mtw_re_ref, mtw_im_ref,
    ms_re_ref, ms_im_ref, d_re_ref, d_im_ref, c0_re_ref, c0_im_ref, x_ref,
    *, n1: int, radices: tuple[int, ...],
):
    """Column-blocked fused real inverse for the composite's level 1:
    (B, TC, A/2) packed-plane tiles of the (B, C, A/2) spectral grid ->
    (B, A, TC) natural-time tiles of the (B, A, C) output (the final
    transpose happens as an in-VMEM relayout, not an HBM pass)."""
    bb, tc, m = yre_ref.shape
    rows = bb * tc
    xr = _irfft_core(
        yre_ref[...].reshape(rows, m), yim_ref[...].reshape(rows, m),
        stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
        ms_re_ref[...], ms_im_ref[...], d_re_ref[...], d_im_ref[...],
        c0_re_ref[...], c0_im_ref[...],
        n1=n1, radices=radices, ordered=True,
    )
    v = xr.reshape(n1, bb, tc, LANES)
    v = jnp.swapaxes(v, 2, 3)  # (n1, b, 128, tc)
    v = jnp.swapaxes(v, 0, 1)  # (b, n1, 128, tc)
    x_ref[...] = v.reshape(bb, n1 * LANES, tc)


def _irfft_packed_cols_impl(yre: jax.Array, yim: jax.Array, a: int) -> jax.Array:
    """(B, C, A/2) packed planes (length-A spectra down axis 2, one per
    (batch, stride-C column)) -> (B, A, C) natural-time real output."""
    b, c, m = yre.shape
    n1 = a // LANES
    radices, (stw_re, stw_im), (mtw_re, mtw_im), ms, d, c0 = _rifft_tables(a)
    tc = _v2_tile(b, a, c)
    assert tc > 0
    num_stages = stw_re.shape[0]
    half = LANES // 2

    kern = functools.partial(_irfft_cols_kernel, n1=n1, radices=radices)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    (x,) = pl.pallas_call(
        kern,
        grid=(c // tc,),
        in_specs=[
            pl.BlockSpec((b, tc, m), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tc, m), lambda k: (0, k, 0), memory_space=pltpu.VMEM),
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
            table((n1, LANES)),
            table((n1, LANES)),
            table((LANES, LANES)),
            table((LANES, LANES)),
            table((half, LANES)),
            table((half, LANES)),
            table((1, LANES)),
            table((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((b, a, tc), lambda k: (0, 0, k), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, a, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * c * n1 * LANES * LANES
            + int(2.5 * b * c * a * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * b * c * a),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(yre, jnp.float32), jnp.asarray(yim, jnp.float32),
        stw_re, stw_im, mtw_re, mtw_im, ms[0], ms[1], d[0], d[1], c0[0], c0[1],
    )
    return x


def _rfft_packed_joint(x: jax.Array, n: int, ordered: bool = True) -> jax.Array:
    """Joint-buffer fused real forward: (B, N) -> (B, N) [re | im] planes.
    Internal (no autodiff rule); the zero-relayout form for self-chaining
    benches and single-tensor spectrum storage."""
    return _pallas_rfft_packed_impl(x, n, ordered, joint=True)


def _rfft_db_kernel(
    x_hbm,
    stw_re_ref,
    stw_im_ref,
    msf_ref,
    msg_ref,
    alt_ref,
    y_hbm,
    xbuf,
    ybuf,
    in_sem,
    out_sem,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
    tb: int,
    nchunks: int,
):
    """Manually double-buffered fused real forward (joint [re|im] output).

    The probe-E fallback: instead of relying on the Mosaic grid pipeliner
    to overlap block DMA with compute (ROOFLINE.md's serial-phase bound
    assumes it does not), the batch stays in HBM (memory_space=ANY) and
    the kernel drives its own two-slot make_async_copy pipeline — while
    tile i computes, tile i+1 streams in and tile i-1 streams out
    (pallas guide, "Patterns: Double Buffering")."""
    n = n1 * LANES
    m = n // 2

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tb, tb), :], xbuf.at[slot], in_sem.at[slot]
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            ybuf.at[slot], y_hbm.at[pl.ds(i * tb, tb), :], out_sem.at[slot]
        )

    in_dma(0, 0).start()

    def step(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            in_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        in_dma(slot, i).wait()
        xt = xbuf[slot]
        yr2, yi2 = _rfft_tile(
            xt, stw_re_ref[...], stw_im_ref[...],
            msf_ref[...], msg_ref[...], alt_ref[...],
            n1=n1, radices=radices, ordered=ordered,
        )

        # The same slot's previous out-DMA (chunk i-2) must land before
        # the buffer is overwritten.
        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        ybuf[slot, :, :m] = yr2
        ybuf[slot, :, m:] = yi2
        out_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nchunks, step, None)

    # Drain the tail: the last one (nchunks==1) or two in-flight stores.
    if nchunks >= 2:
        out_dma((nchunks - 2) % 2, nchunks - 2).wait()
    out_dma((nchunks - 1) % 2, nchunks - 1).wait()


def _rfft_packed_joint_db(x: jax.Array, n: int, ordered: bool = True) -> jax.Array:
    """Double-buffered twin of _rfft_packed_joint: (B, N) -> (B, N) [re|im].

    Same tile math (_rfft_tile), manual DMA pipeline instead of the grid
    pipeliner. Kept alongside the grid form until the on-chip A/B (probe
    queue section I) decides which one dispatches."""
    assert not _small_dispatch(n), "db variant covers the Stockham kernel only"
    n1 = n // LANES
    radices, (stw_re, stw_im), (dft_re, dft_im) = _tables_fwd_folded(n)
    half = LANES // 2
    alt = dft_re[:, LANES // 2].reshape(1, LANES).copy()

    b = x.shape[0]
    tb = _rbatch_tile(n, b)
    pad = (-b) % tb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bp = b + pad
    nchunks = bp // tb

    msf = np.concatenate([dft_re[:, :half], dft_im[:, :half]], axis=1)
    msg = np.concatenate([-dft_im[:, :half], dft_re[:, :half]], axis=1)
    kern = functools.partial(
        _rfft_db_kernel, n1=n1, radices=radices, ordered=ordered,
        tb=tb, nchunks=nchunks,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tb, n), jnp.float32),
            pltpu.VMEM((2, tb, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bp * n1 * LANES * LANES
            + int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(x, jnp.float32), stw_re, stw_im, msf, msg, alt)
    return y[:b] if pad else y


def _irfft_db_kernel(
    yre_hbm,
    yim_hbm,
    stw_re_ref,
    stw_im_ref,
    mtw_re_ref,
    mtw_im_ref,
    ms_re_ref,
    ms_im_ref,
    d_re_ref,
    d_im_ref,
    c0_re_ref,
    c0_im_ref,
    x_hbm,
    rebuf,
    imbuf,
    xbuf,
    in_re_sem,
    in_im_sem,
    out_sem,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
    tb: int,
    nchunks: int,
):
    """Double-buffered twin of _irfft_kernel (see _rfft_db_kernel): two
    plane in-DMAs + one time-domain out-DMA per chunk, manual two-slot
    pipeline."""
    n = n1 * LANES
    m = n // 2

    def in_dmas(slot, i):
        return (
            pltpu.make_async_copy(
                yre_hbm.at[pl.ds(i * tb, tb), :], rebuf.at[slot], in_re_sem.at[slot]
            ),
            pltpu.make_async_copy(
                yim_hbm.at[pl.ds(i * tb, tb), :], imbuf.at[slot], in_im_sem.at[slot]
            ),
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            xbuf.at[slot], x_hbm.at[pl.ds(i * tb, tb), :], out_sem.at[slot]
        )

    for dma in in_dmas(0, 0):
        dma.start()

    def step(i, carry):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            for dma in in_dmas(jax.lax.rem(i + 1, 2), i + 1):
                dma.start()

        for dma in in_dmas(slot, i):
            dma.wait()
        xr = _irfft_core(
            rebuf[slot], imbuf[slot],
            stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
            ms_re_ref[...], ms_im_ref[...], d_re_ref[...], d_im_ref[...],
            c0_re_ref[...], c0_im_ref[...],
            n1=n1, radices=radices, ordered=ordered,
        )

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        xbuf[slot] = jnp.swapaxes(xr, 0, 1).reshape(tb, n)
        out_dma(slot, i).start()
        return carry

    jax.lax.fori_loop(0, nchunks, step, None)
    if nchunks >= 2:
        out_dma((nchunks - 2) % 2, nchunks - 2).wait()
    out_dma((nchunks - 1) % 2, nchunks - 1).wait()


def _irfft_packed_db(
    yre: jax.Array, yim: jax.Array, n: int, ordered: bool = True
) -> jax.Array:
    """Double-buffered twin of _pallas_irfft_packed_impl (probe queue
    section I decides dispatch)."""
    assert not _small_dispatch(n), "db variant covers the Stockham kernel only"
    n1 = n // LANES
    radices, (stw_re, stw_im), (mtw_re, mtw_im), ms, d, c0 = _rifft_tables(n)

    b = yre.shape[0]
    tb = _rbatch_tile(n, b)
    pad = (-b) % tb
    if pad:
        yre = jnp.pad(yre, ((0, pad), (0, 0)))
        yim = jnp.pad(yim, ((0, pad), (0, 0)))
    bp = b + pad
    nchunks = bp // tb
    m = n // 2

    kern = functools.partial(
        _irfft_db_kernel, n1=n1, radices=radices, ordered=ordered,
        tb=tb, nchunks=nchunks,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    x = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + [vmem] * 10,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bp, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tb, m), jnp.float32),
            pltpu.VMEM((2, tb, m), jnp.float32),
            pltpu.VMEM((2, tb, n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * n1 * LANES * LANES
            + int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(yre, jnp.float32), jnp.asarray(yim, jnp.float32),
        stw_re, stw_im, mtw_re, mtw_im,
        ms[0], ms[1], d[0], d[1], c0[0], c0[1],
    )
    return x[:b] if pad else x


def _pallas_irfft_packed_impl(yre: jax.Array, yim: jax.Array, n: int, ordered: bool) -> jax.Array:
    """Packed half-spectrum planes ((B, N/2) x2) -> (B, N) f32, unscaled."""
    if _small_dispatch(n):
        return _small_irfft_packed(
            jnp.asarray(yre, jnp.float32), jnp.asarray(yim, jnp.float32), n
        )
    n1 = n // LANES
    radices, (stw_re, stw_im), (mtw_re, mtw_im), ms, d, c0 = _rifft_tables(n)

    b = yre.shape[0]
    tb = _rbatch_tile(n, b)
    pad = (-b) % tb
    if pad:
        yre = jnp.pad(yre, ((0, pad), (0, 0)))
        yim = jnp.pad(yim, ((0, pad), (0, 0)))
    bp = b + pad
    num_stages = stw_re.shape[0]

    kern = functools.partial(_irfft_kernel, n1=n1, radices=radices, ordered=ordered)

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    m = n // 2
    half = LANES // 2
    (x,) = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
            table((n1, LANES)),
            table((n1, LANES)),
            table((LANES, LANES)),  # stacked [Mt; Mbf]
            table((LANES, LANES)),
            table((half, LANES)),  # D (row-0 fix)
            table((half, LANES)),
            table((1, LANES)),  # c0 (Nyquist column)
            table((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * n1 * LANES * LANES
            + int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(yre, jnp.float32),
        jnp.asarray(yim, jnp.float32),
        stw_re,
        stw_im,
        mtw_re,
        mtw_im,
        ms[0],
        ms[1],
        d[0],
        d[1],
        c0[0],
        c0[1],
    )

    if pad:
        x = x[:b]
    return x


def _packed_product(ar, ai, br, bi, scale: float):
    """Packed-plane spectral product with the DC·DC / Nyq·Nyq bin-0
    patch-up (the in-kernel twin of ops.convolve.convolve_accumulate_packed;
    reference scalar patch-up: simd/chowdsp_fft_impl_sse.cpp:1640-1644)."""
    pr = ar * br - ai * bi
    pi = ar * bi + ai * br
    col = jax.lax.broadcasted_iota(jnp.int32, pr.shape, pr.ndim - 1)
    pr = jnp.where(col == 0, ar * br, pr)
    pi = jnp.where(col == 0, ai * bi, pi)
    if scale != 1.0:
        pr = pr * scale
        pi = pi * scale
    return pr, pi


def _irfft_conv_kernel(
    are_ref, aim_ref, bre_ref, bim_ref,
    stw_re_ref, stw_im_ref, mtw_re_ref, mtw_im_ref,
    ms_re_ref, ms_im_ref, d_re_ref, d_im_ref, c0_re_ref, c0_im_ref,
    x_ref,
    *,
    n1: int,
    radices: tuple[int, ...],
    ordered: bool,
    scale: float,
):
    """Fused spectral-multiply + real inverse: irfft(scale * (A ⊙ B)) in
    one kernel, saving the standalone product's HBM round trip (write +
    re-read of the product spectrum ≈ 2 passes over the data). The B
    planes may be a (1, N/2) broadcast row (a shared filter — the FIR
    case) or batch-tiled like A. The single-kernel composition of the
    reference's fft_convolve + inverse (/root/reference/chowdsp_fft.h:
    147-154 feeding fft_transform backward)."""
    tb = are_ref.shape[0]
    pr, pi = _packed_product(
        are_ref[...], aim_ref[...], bre_ref[...], bim_ref[...], scale
    )
    xr = _irfft_core(
        pr, pi,
        stw_re_ref[...], stw_im_ref[...], mtw_re_ref[...], mtw_im_ref[...],
        ms_re_ref[...], ms_im_ref[...], d_re_ref[...], d_im_ref[...],
        c0_re_ref[...], c0_im_ref[...],
        n1=n1, radices=radices, ordered=ordered,
    )
    x_ref[...] = jnp.swapaxes(xr, 0, 1).reshape(tb, n1 * LANES)


def _pallas_irfft_conv_impl(
    are, aim, bre, bim, n: int, ordered: bool, scale: float
) -> jax.Array:
    """(B, N/2) x2 spectrum A, (B or 1, N/2) x2 spectrum B -> (B, N)."""
    n1 = n // LANES
    radices, (stw_re, stw_im), (mtw_re, mtw_im), ms, d, c0 = _rifft_tables(n)

    b = are.shape[0]
    shared_b = bre.shape[0] == 1 and b != 1
    tb = _rbatch_tile(n, b)
    pad = (-b) % tb
    if pad:
        are = jnp.pad(are, ((0, pad), (0, 0)))
        aim = jnp.pad(aim, ((0, pad), (0, 0)))
        if not shared_b:
            bre = jnp.pad(bre, ((0, pad), (0, 0)))
            bim = jnp.pad(bim, ((0, pad), (0, 0)))
    bp = b + pad
    num_stages = stw_re.shape[0]

    kern = functools.partial(
        _irfft_conv_kernel, n1=n1, radices=radices, ordered=ordered, scale=scale
    )

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    m = n // 2
    half = LANES // 2
    b_spec = (
        table((1, m))
        if shared_b
        else pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    (x,) = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            b_spec,
            b_spec,
            table((num_stages, n1, LANES)),
            table((num_stages, n1, LANES)),
            table((n1, LANES)),
            table((n1, LANES)),
            table((LANES, LANES)),
            table((LANES, LANES)),
            table((half, LANES)),
            table((half, LANES)),
            table((1, LANES)),
            table((1, LANES)),
        ],
        out_specs=[
            pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bp * n1 * LANES * LANES
            + int(2.5 * bp * n * max(1, np.log2(max(2, n1)))) * 2,
            bytes_accessed=4 * (2 * bp * n),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(
        jnp.asarray(are, jnp.float32),
        jnp.asarray(aim, jnp.float32),
        jnp.asarray(bre, jnp.float32),
        jnp.asarray(bim, jnp.float32),
        stw_re, stw_im, mtw_re, mtw_im,
        ms[0], ms[1], d[0], d[1], c0[0], c0[1],
    )

    if pad:
        x = x[:b]
    return x


def _conv_irfft_reference(are, aim, bre, bim, n, ordered, scaling):
    """Unfused composition (the differentiable/VJP + fallback path)."""
    from .convolve import convolve_accumulate_packed

    pr, pi = convolve_accumulate_packed((are, aim), (bre, bim), scaling=scaling)
    return irfft_packed(pr, pi, ordered=ordered)


@functools.partial(jax.custom_vjp, nondiff_argnames=("n", "ordered", "scale"))
def _pallas_irfft_conv(are, aim, bre, bim, n, ordered, scale):
    return _pallas_irfft_conv_impl(are, aim, bre, bim, n, ordered, scale)


def _pallas_irfft_conv_fwd(are, aim, bre, bim, n, ordered, scale):
    return (
        _pallas_irfft_conv_impl(are, aim, bre, bim, n, ordered, scale),
        (are, aim, bre, bim),
    )


def _pallas_irfft_conv_bwd(n, ordered, scale, res, ct):
    are, aim, bre, bim = res
    _, vjp = jax.vjp(
        lambda ar, ai, br, bi: _conv_irfft_reference(
            ar, ai, br, bi, n, ordered, scale
        ),
        are, aim, bre, bim,
    )
    return vjp(ct)


_pallas_irfft_conv.defvjp(_pallas_irfft_conv_fwd, _pallas_irfft_conv_bwd)


def convolve_irfft_packed(are, aim, bre, bim, scaling=1.0, ordered: bool = True):
    """Fused ``irfft_packed(A ⊙ B * scaling)``: the spectral product (with
    the packed DC/Nyq patch-up) runs inside the inverse kernel, so the
    product spectrum never touches HBM. A is batched (..., N/2) packed
    planes; B either matches A's batch or is a single shared spectrum
    (a filter). ``scaling`` must be a static Python number for the fused
    path; traced scalings, small/composite sizes, and non-kernel engines
    fall back to the unfused composition (same math, one extra HBM round
    trip). Unscaled transform semantics otherwise (backward carries N)."""
    m = are.shape[-1]
    n = 2 * m
    fusable = (
        isinstance(scaling, (int, float))
        and not _small_dispatch(n)
        and n <= _MAX_FUSED_REAL
        and _is_smooth_multiple(n)
        and jax.dtypes.canonicalize_dtype(jnp.float32) == jnp.float32
    )
    if not fusable:
        return _conv_irfft_reference(are, aim, bre, bim, n, ordered, scaling)
    af, batch_shape = _flatten_batch(are.astype(jnp.float32))
    aif, _ = _flatten_batch(aim.astype(jnp.float32))
    bf = bre.astype(jnp.float32).reshape(-1, m)
    bif = bim.astype(jnp.float32).reshape(-1, m)
    if bf.shape[0] not in (1, af.shape[0]):
        raise ValueError(
            f"B batch {bf.shape[0]} must be 1 or match A batch {af.shape[0]}"
        )
    x = _pallas_irfft_conv(af, aif, bf, bif, n, ordered, float(scaling))
    return x.reshape(*batch_shape, n)


# ---------------------------------------------------------------------------
# Small-N direct-DFT path (N < 256): one MXU matmul per tile, no Stockham
# stages at all. The reference's SIMD backends cover N down to 32 via the
# N % w^2 size rule (/root/reference/simd/chowdsp_fft_impl_common.hpp:165-177,
# tested from 2^5 at /root/reference/test/test.cpp:270-277); the TPU-native
# equivalent of "the whole transform fits the vector width" is "the whole
# DFT matrix fits the systolic array": g = 128//N transforms are packed per
# 128-lane row (a free reshape) and multiplied by a block-diagonal
# (g*N, g*N) DFT matrix, so the MXU runs at full K=128 occupancy even for
# N=32. Real transforms are 2 real matmuls each (the input/output is real,
# so no Karatsuba); the packed DC/Nyquist layout is folded into the
# matrices' column 0. Bins come out in natural order (unordered == ordered,
# a legal layout choice — same as the Stockham engine's).
# ---------------------------------------------------------------------------


def _small_g(n: int) -> int:
    return max(1, LANES // n)


@functools.lru_cache(maxsize=64)
def _small_tables_c(n: int, forward: bool):
    """Block-diagonal complex DFT matrix (g*N, g*N) as f32 re/im planes."""
    g = _small_g(n)
    sgn = -1.0 if forward else 1.0
    k = np.arange(n, dtype=np.float64)
    ang = sgn * 2.0 * np.pi * np.outer(k, k) / float(n)
    eye = np.eye(g, dtype=np.float64)
    return (
        np.kron(eye, np.cos(ang)).astype(np.float32),
        np.kron(eye, np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=64)
def _small_tables_r(n: int):
    """Real-forward matrices (g*N, g*N/2): x @ Cr = re plane, x @ Ci = im
    plane, with DC in re[:, 0] and Nyquist (alternating-sign row sum) folded
    into Ci[:, 0] — the packed layout costs nothing here."""
    g = _small_g(n)
    m = n // 2
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(m, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(nn, kk) / float(n)
    cr = np.cos(ang)
    ci = np.sin(ang)
    ci[:, 0] = np.where(nn.astype(np.int64) % 2 == 0, 1.0, -1.0)  # Nyquist col
    eye = np.eye(g, dtype=np.float64)
    return np.kron(eye, cr).astype(np.float32), np.kron(eye, ci).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _small_tables_ri(n: int):
    """Real-inverse matrices (g*N/2, g*N), unscaled: x = re @ Dr + im @ Di
    via x_n = X0 + (-1)^n X_{N/2} + sum_{k=1}^{N/2-1} 2(re_k cos - im_k sin)."""
    g = _small_g(n)
    m = n // 2
    nn = np.arange(n, dtype=np.float64)
    kk = np.arange(m, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(kk, nn) / float(n)
    dr = 2.0 * np.cos(ang)
    dr[0, :] = 1.0
    di = -2.0 * np.sin(ang)
    di[0, :] = np.where(nn.astype(np.int64) % 2 == 0, 1.0, -1.0)
    eye = np.eye(g, dtype=np.float64)
    return np.kron(eye, dr).astype(np.float32), np.kron(eye, di).astype(np.float32)


_SMALL_TB = 256  # batch tile (rows of g packed transforms)


def _small_pack(x: jax.Array, g: int) -> tuple[jax.Array, int]:
    """(B, N) -> (ceil(B/g), g*N) lane packing (a free row-major reshape)."""
    b, n = x.shape
    pad = (-b) % g
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x.reshape(-1, g * n), b


def _small_call(kern, inputs, tables, n_out: int, num_out: int):
    """Shared pallas_call driver: grid over row tiles, tables replicated."""
    rows = inputs[0].shape[0]
    tb = min(_SMALL_TB, max(8, (rows // 8) * 8 or 8))
    pad = (-rows) % tb
    if pad:
        inputs = [jnp.pad(v, ((0, pad), (0, 0))) for v in inputs]
    rp = rows + pad
    n_in = inputs[0].shape[1]

    def table(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, z=zeros: z, memory_space=pltpu.VMEM)

    # 2-plane in-place form where shapes admit it (the complex small kernel:
    # 2 in == 2 out, identical specs) — see _ALIAS_KERNELS.
    n_alias = min(len(inputs), num_out) if n_in == n_out else 0
    outs = pl.pallas_call(
        kern,
        grid=(rp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in inputs
        ]
        + [table(t.shape) for t in tables],
        out_specs=[
            pl.BlockSpec((tb, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(num_out)
        ],
        out_shape=[jax.ShapeDtypeStruct((rp, n_out), jnp.float32) for _ in range(num_out)],
        input_output_aliases=_alias_io(n_alias) or {},
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * n_in * n_out,
            bytes_accessed=4 * rp * (len(inputs) * n_in + num_out * n_out),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(*inputs, *[jnp.asarray(t) for t in tables])
    if pad:
        outs = [o[:rows] for o in outs]
    return outs


def _small_cfft_kernel(xre_ref, xim_ref, wr_ref, wi_ref, yre_ref, yim_ref):
    # 4-matmul schoolbook, not Karatsuba: at N <= 64 the reference error
    # bound (2e-7*N) leaves < 2x margin and Karatsuba's (a+b)(Mr+Mi)
    # product costs ~1 bit; MXU time is pass-bound so the accuracy is
    # nearly free at these row counts.
    ar, ai = xre_ref[...], xim_ref[...]
    mr, mi = wr_ref[...], wi_ref[...]
    yre_ref[...] = _merge_dot(ar, mr) - _merge_dot(ai, mi)
    yim_ref[...] = _merge_dot(ar, mi) + _merge_dot(ai, mr)


def _small_rfft_kernel(x_ref, cc_ref, yre_ref, yim_ref):
    # One column-packed matmul x @ [Cr | Ci] (MXU time is pass-bound, so
    # the packed form halves merge time vs two g*N/2-col matmuls).
    m = yre_ref.shape[-1]
    out = _merge_dot(x_ref[...], cc_ref[...])
    yre_ref[...] = out[:, :m]
    yim_ref[...] = out[:, m:]


def _small_irfft_kernel(re_ref, im_ref, dd_ref, x_ref):
    # One stacked-K matmul [re | im] @ [Dr; Di] (K = g*N <= 240).
    x_ref[...] = _merge_dot(
        jnp.concatenate([re_ref[...], im_ref[...]], axis=-1), dd_ref[...]
    )


def _small_cfft_pair(xre, xim, n, forward):
    g = _small_g(n)
    wr, wi = _small_tables_c(n, forward)
    pr, b = _small_pack(xre, g)
    pi, _ = _small_pack(xim, g)
    yr, yi = _small_call(_small_cfft_kernel, [pr, pi], [wr, wi], g * n, 2)
    return yr.reshape(-1, n)[:b], yi.reshape(-1, n)[:b]


def _small_rfft_packed(x, n):
    g = _small_g(n)
    cr, ci = _small_tables_r(n)
    cc = np.concatenate([cr, ci], axis=1)  # (g*N, g*N) column-packed
    p, b = _small_pack(x, g)
    yr, yi = _small_call(_small_rfft_kernel, [p], [cc], g * (n // 2), 2)
    m = n // 2
    return yr.reshape(-1, m)[:b], yi.reshape(-1, m)[:b]


def _small_irfft_packed(yre, yim, n):
    g = _small_g(n)
    dr, di = _small_tables_ri(n)
    dd = np.concatenate([dr, di], axis=0)  # (g*N, g*N) stacked-K
    pr, b = _small_pack(yre, g)
    pi, _ = _small_pack(yim, g)
    (x,) = _small_call(_small_irfft_kernel, [pr, pi], [dd], g * n, 1)
    return x.reshape(-1, n)[:b]


# ---------------------------------------------------------------------------
# Engine entry points (same signatures as the Stockham engine)
# ---------------------------------------------------------------------------


def _flatten_batch(x):
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    if not batch_shape:
        return x.reshape(1, n), batch_shape
    return x.reshape(-1, n), batch_shape


def _digit_transpose(y: jax.Array, n: int, inverse: bool) -> jax.Array:
    """Unordered (k1, k2) layout <-> natural order: one (N1, 128) transpose,
    the analog of pffft_zreorder (sse:1466-1515)."""
    n1 = n // LANES
    b = y.shape[0]
    if not inverse:
        return y.reshape(b, n1, LANES).swapaxes(-1, -2).reshape(b, n)
    return y.reshape(b, LANES, n1).swapaxes(-1, -2).reshape(b, n)


# ---------------------------------------------------------------------------
# Composite (HBM-staged) transforms for N beyond one kernel's VMEM budget:
# a second four-step level at the XLA level. N = A * C; length-A kernel FFTs
# down the columns, a (C, A) twiddle, length-C kernel FFTs along the rows.
# The kernels run in their *unordered* (digit-transposed) layout; rather
# than paying two reorder passes, the sub-FFT permutation pi is absorbed
# into the twiddle table (host-side) and into the composite bin map:
# position (j, j2) holds X[pi_A(j) + A*pi_C(j2)], and natural order is ONE
# structured 5D transpose (no gathers). This mirrors how the reference
# composes its SIMD-width sub-FFTs with a merge permutation it likewise
# never materializes (the pffft "internal layout", SURVEY.md section 2 row 9).
# ---------------------------------------------------------------------------


def _kernel_size_ok(x: int) -> bool:
    """x runs in ONE Stockham kernel: {2,3,5}-smooth multiple of 128 within
    the VMEM-bounded size window."""
    return _MIN_N <= x <= _MAX_N and _is_smooth_multiple(x)


def _level_ok(x: int) -> bool:
    """x can run as one composite level: a single Stockham kernel or the
    direct-DFT matmul path."""
    return _kernel_size_ok(x) or _small_dispatch(x)


@functools.lru_cache(maxsize=128)
def _split_large(n: int, real: bool = False) -> tuple[int, int]:
    """n = A * C, A >= C, both factors composite-level sizes, as balanced
    as possible. Kernel-kernel pairs are preferred (round-2 behavior,
    unchanged for every size that has one); sizes without a kernel pair —
    the medium smooth non-multiples of 128 (576, 720, 960, ...) — fall to
    direct-DFT factor pairs. With ``real`` both factors must be even (the
    real composite halves A for its packed level 1 and C for the Hermitian
    assembly). The reference's size domain is any {2,3,4,5} product
    (/root/reference/simd/chowdsp_fft_impl_common.hpp:216-225)."""
    best = None
    for a in range(_MIN_N, _MAX_N + 1, LANES):
        if n % a:
            continue
        c = n // a
        if c > a:
            continue
        if _kernel_size_ok(a) and _kernel_size_ok(c):
            # prefer the most balanced split (smallest a/c ratio)
            if best is None or a / c < best[0] / best[1]:
                best = (a, c)
    if best is not None:
        return best
    # No kernel pair: most balanced pair of level-capable factors (the
    # first valid divisor at or above sqrt(n) is the most balanced).
    hi = min(n // _MIN_SMALL, _MAX_N)
    for a in range(math.isqrt(n - 1) + 1, hi + 1):
        if n % a:
            continue
        c = n // a
        if real and (a % 2 or c % 2):
            continue
        if _level_ok(a) and _level_ok(c):
            return a, c
    raise InvalidSizeError(
        f"N={n} has no two-level composite split (need A*C with both "
        f"factors single-kernel or direct-DFT sizes"
        f"{', both even,' if real else ''} A in [{_MIN_SMALL}, {_MAX_N}])"
    )


def _kernel_perm(n: int) -> np.ndarray:
    """pi(q): the bin stored at flat position q of the kernel's unordered
    output (q = k1*128 + k2 holds X[k1 + (n/128)*k2])."""
    n1 = n // LANES
    q = np.arange(n, dtype=np.int64)
    return (q // LANES) + n1 * (q % LANES)


@functools.lru_cache(maxsize=32)
def _large_twiddle(n: int, forward: bool, folded: bool = True):
    """(C, A) four-step twiddle W_N^(sgn * c * k1), float64 -> f32. With
    ``folded`` the columns are pre-permuted by the kernel's unordered
    layout (the unordered composite path); without, natural k1 order (the
    ordered path, whose sub-FFTs emit natural bins)."""
    a, c = _split_large(n)
    sgn = -1.0 if forward else 1.0
    if folded:
        k1 = _kernel_perm(a).astype(np.float64)[None, :]
    else:
        k1 = np.arange(a, dtype=np.float64)[None, :]
    cc = np.arange(c, dtype=np.float64)[:, None]
    ang = sgn * 2.0 * np.pi * (cc * k1) / float(n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


# ---------------------------------------------------------------------------
# Composite v2 (round 3): the whole two-level transform in TWO column-blocked
# kernels per direction — 2 HBM round trips instead of the v1 chain's 7
# (transpose + kernel + digit-transpose per level + final transpose). The
# reference's analog is that its SIMD sub-FFT merge permutation is likewise
# never materialized as a separate pass (pffft internal layout, SURVEY.md
# section 2 row 9).
#
#   forward:  K1 reads (B, A, TC) tiles straight from the natural (B, N) =
#             (B, A, C) input, FFTs length A along the middle axis, flattens
#             to ordered bins in-kernel and writes (B, TC, A) tiles of the
#             (B, C, A) intermediate. K2 reads (B, C, TA) tiles, applies the
#             four-step twiddle W_N^{-qk} from a (C, A) table slab, FFTs
#             length C along the middle axis, and writes ordered (B, C, TA)
#             tiles — the output IS the natural-order (B, N) spectrum
#             (bin q + A*t at flat position t*A + q).
#   backward: exact mirror — K2rev consumes ordered C bins (in-kernel
#             inverse flatten + the reverse merge->twiddle->stages pipeline),
#             un-twiddles, K1rev consumes ordered A bins and emits natural
#             time order.
#
# The per-level in-kernel relayouts ride VMEM/register moves; HBM sees each
# element exactly twice per direction. Tiles are gated by VMEM (fall back to
# the v1 chain when a block cannot fit).
# ---------------------------------------------------------------------------


def _rev_pipeline(vre, vim, mtw_re, mtw_im, stw_re, stw_im, dft_re, dft_im, radices, n1):
    """Shared inverse pipeline on unordered (n1, rows, 128) planes:
    merge -> four-step twiddle -> backward Stockham (mirrors _fft_kernel's
    reverse_order branch)."""
    rows = vre.shape[1]
    yr, yi = _merge_karatsuba(vre, vim, dft_re, dft_im, n1 * rows)
    yr = yr.reshape(n1, rows, LANES)
    yi = yi.reshape(n1, rows, LANES)
    mr = mtw_re[:, None, :]
    mi = mtw_im[:, None, :]
    yr, yi = yr * mr - yi * mi, yr * mi + yi * mr
    return _stockham_rows(yr, yi, radices, stw_re, stw_im, False)


def _unflatten_bins(v, n1):
    """Ordered (bins, rows) -> unordered (n1, rows, 128): inverse of the
    forward flatten chain (leading-dim split is a layout no-op; the final
    swap is the minor 2D relayout)."""
    rows = v.shape[1]
    v = v.reshape(LANES, n1, rows)
    v = jnp.swapaxes(v, 0, 1)  # (n1, 128, rows)
    return jnp.swapaxes(v, 1, 2)  # (n1, rows, 128)


def _flatten_bins(v, n1):
    """Unordered (n1, rows, 128) -> ordered (bins, rows): minor 2D transpose
    -> major swap -> leading collapse (the real kernel's flatten chain,
    full-width)."""
    rows = v.shape[1]
    v = jnp.swapaxes(v, 1, 2)  # (n1, 128, rows)
    v = jnp.swapaxes(v, 0, 1)  # (128, n1, rows)
    return v.reshape(n1 * LANES, rows)


def _cfft_v2_l1_kernel(
    xre_ref, xim_ref, stw_re_ref, stw_im_ref, dft_re_ref, dft_im_ref,
    yre_ref, yim_ref, *, n1: int, radices: tuple[int, ...],
):
    """Forward level 1: (B, A, TC) tile -> ordered length-A FFT of every
    stride-C subsequence, emitted minor-transposed as (B, TC, A)."""
    bb, _, tc = xre_ref.shape
    rows = bb * tc

    def load(ref):
        v = jnp.swapaxes(ref[...].reshape(bb, n1, LANES, tc), 0, 1)
        return jnp.swapaxes(v, 2, 3).reshape(n1, rows, LANES)

    vre, vim = load(xre_ref), load(xim_ref)
    vre, vim = _stockham_rows(vre, vim, radices, stw_re_ref[...], stw_im_ref[...], True)
    yr, yi = _merge_karatsuba(vre, vim, dft_re_ref[...], dft_im_ref[...], n1 * rows)

    def out(j):
        flat = _flatten_bins(j.reshape(n1, rows, LANES), n1)  # (A, rows)
        return jnp.swapaxes(flat, 0, 1).reshape(bb, tc, n1 * LANES)

    yre_ref[...] = out(yr)
    yim_ref[...] = out(yi)


def _cfft_v2_l2_kernel(
    xre_ref, xim_ref, twr_ref, twi_ref, stw_re_ref, stw_im_ref,
    dft_re_ref, dft_im_ref, yre_ref, yim_ref, *, n1: int, radices: tuple[int, ...],
):
    """Forward level 2: (B, C, TA) tile of the intermediate -> four-step
    twiddle (slab (C, TA)) -> ordered length-C FFT along axis 1, in place."""
    bb, _, ta = xre_ref.shape
    rows = bb * ta
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    xr = xre_ref[...]
    xi = xim_ref[...]
    ar = xr * twr - xi * twi
    ai = xr * twi + xi * twr

    def relayout(v):
        v = jnp.swapaxes(v.reshape(bb, n1, LANES, ta), 0, 1)
        return jnp.swapaxes(v, 2, 3).reshape(n1, rows, LANES)

    vre, vim = relayout(ar), relayout(ai)
    vre, vim = _stockham_rows(vre, vim, radices, stw_re_ref[...], stw_im_ref[...], True)
    yr, yi = _merge_karatsuba(vre, vim, dft_re_ref[...], dft_im_ref[...], n1 * rows)

    def out(j):
        flat = _flatten_bins(j.reshape(n1, rows, LANES), n1)  # (C, rows)
        return jnp.swapaxes(flat.reshape(n1 * LANES, bb, ta), 0, 1)  # (b, C, ta)

    yre_ref[...] = out(yr)
    yim_ref[...] = out(yi)


def _cfft_v2_l2_rev_kernel(
    xre_ref, xim_ref, twr_ref, twi_ref, stw_re_ref, stw_im_ref,
    mtw_re_ref, mtw_im_ref, dft_re_ref, dft_im_ref, yre_ref, yim_ref,
    *, n1: int, radices: tuple[int, ...],
):
    """Backward level 2: (B, C, TA) natural-order spectrum tile -> inverse
    length-C FFT along axis 1 (consuming ordered bins) -> un-twiddle by the
    conjugate slab -> (B, C, TA) time-order tile."""
    bb, _, ta = xre_ref.shape
    rows = bb * ta

    def load(ref):
        v = jnp.swapaxes(ref[...], 0, 1).reshape(n1 * LANES, rows)  # (C, rows)
        return _unflatten_bins(v, n1)

    vre, vim = load(xre_ref), load(xim_ref)
    vre, vim = _rev_pipeline(
        vre, vim, mtw_re_ref[...], mtw_im_ref[...], stw_re_ref[...],
        stw_im_ref[...], dft_re_ref[...], dft_im_ref[...], radices, n1,
    )

    def out(v):  # (n1, rows, 128) time -> (b, C, ta)
        v = v.reshape(n1, bb, ta, LANES)
        v = jnp.swapaxes(v, 2, 3)  # (n1, b, 128, ta)
        v = jnp.swapaxes(v, 0, 1)  # (b, n1, 128, ta)
        return v.reshape(bb, n1 * LANES, ta)

    ur, ui = out(vre), out(vim)
    twr = twr_ref[...][None]
    twi = twi_ref[...][None]
    yre_ref[...] = ur * twr - ui * twi
    yim_ref[...] = ur * twi + ui * twr


def _cfft_v2_l1_rev_kernel(
    xre_ref, xim_ref, stw_re_ref, stw_im_ref, mtw_re_ref, mtw_im_ref,
    dft_re_ref, dft_im_ref, yre_ref, yim_ref, *, n1: int, radices: tuple[int, ...],
):
    """Backward level 1: (B, TC, A) tile (ordered A bins) -> inverse
    length-A FFT -> natural time, emitted minor-transposed as (B, A, TC)."""
    bb, tc, _ = xre_ref.shape
    rows = bb * tc

    def load(ref):
        v = jnp.swapaxes(ref[...].reshape(rows, n1 * LANES), 0, 1)  # (A, rows)
        return _unflatten_bins(v, n1)

    vre, vim = load(xre_ref), load(xim_ref)
    vre, vim = _rev_pipeline(
        vre, vim, mtw_re_ref[...], mtw_im_ref[...], stw_re_ref[...],
        stw_im_ref[...], dft_re_ref[...], dft_im_ref[...], radices, n1,
    )

    def out(v):  # (n1, rows, 128) time -> (b, A, tc)
        v = v.reshape(n1, bb, tc, LANES)
        v = jnp.swapaxes(v, 2, 3)  # (n1, b, 128, tc)
        v = jnp.swapaxes(v, 0, 1)  # (b, n1, 128, tc)
        return v.reshape(bb, n1 * LANES, tc)

    yre_ref[...] = out(vre)
    yim_ref[...] = out(vim)


# Per-plane input-block cap (VMEM gate). 8MB blocks OOM'd real-silicon
# scoped VMEM (121M > 100M limit) at N=2^18 b=16: the in-kernel Stockham
# pipeline keeps several block-sized fp32 temporaries live, so the stack
# runs ~15x the input block. 4MB keeps the whole call under the limit.
_V2_BLOCK_BYTES = 4 << 20


def _v2_tile(b: int, mid: int, minor_len: int) -> int:
    """Minor tile for a (b, mid, t) block: multiple of 128, VMEM-gated.
    Returns 0 when no tile fits (driver falls back to the v1 chain)."""
    for t in (256, 128):
        if minor_len % t == 0 and b * mid * t * 4 <= _V2_BLOCK_BYTES:
            return t
    return 0


def _v2_supported(n: int, b: int) -> bool:
    try:
        a, c = _split_large(n)
    except InvalidSizeError:
        return False
    return _v2_tile(b, a, c) > 0 and _v2_tile(b, c, a) > 0


def _v2_batch_cap(n: int) -> int:
    """Largest batch for which both v2 stage blocks fit the VMEM cap — the
    batch-INDEPENDENT v2 gate (cap > 0 iff the plan has a v2 at any batch;
    bigger batches run the same kernels in batch chunks). This is what the
    unordered dispatch must key on: a composite plan's unordered layout is
    contractual per PLAN, so fft_unordered(h, batch=1) must compose with
    ifft_unordered after convolving against fft_unordered(x, batch=64) —
    a batch-gated v1/v2 choice would hand the two calls incompatible bin
    orders (natural vs digit-transposed)."""
    try:
        a, c = _split_large(n)
    except InvalidSizeError:
        return 0
    if a % LANES or c % LANES:
        return 0
    row_bytes = 4 * LANES  # one batch row of a 128-wide fp32 minor tile
    return min(_V2_BLOCK_BYTES // (a * row_bytes), _V2_BLOCK_BYTES // (c * row_bytes))


def _v2_table(arr):
    """(array, block, index_map) triple for a fully-replicated kernel table."""
    shape = arr.shape
    zeros = (0,) * len(shape)
    return (arr, shape, lambda k, z=zeros: z)


def _v2_call(kern, inputs, tables, grid_steps, in_block, in_idx, out_block, out_idx, out_shape):
    """Shared pallas_call driver for the composite-v2 kernels: 1-D grid over
    minor tiles (a 2-D grid with leading-1 blocks costs 199s of Mosaic
    compile time — NOTES.md round 2), tables replicated, twiddle slabs
    sliced by the grid index via their own index maps.

    Deliberately NOT aliased (no input_output_aliases): level-2 aliasing
    measured -5% at 2^18 (the chain loses its L1/L2 pipelining,
    scratch/logs/r5_alias_ab2.log), and the level-1 kernels emit a
    minor-TRANSPOSED block at a different grid offset, so an aliased
    write at step k would clobber input pages still unread by steps > k."""
    n_elems = int(np.prod(out_shape[0]))
    specs = [pl.BlockSpec(in_block, in_idx, memory_space=pltpu.VMEM) for _ in inputs]
    for t_arr, t_block, t_idx in tables:
        specs.append(pl.BlockSpec(t_block, t_idx, memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kern,
        grid=(grid_steps,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec(out_block, out_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(out_block, out_idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(out_shape[0], jnp.float32),
            jax.ShapeDtypeStruct(out_shape[0], jnp.float32),
        ],
        input_output_aliases={},
        cost_estimate=pl.CostEstimate(
            flops=16 * n_elems,
            bytes_accessed=4 * 4 * n_elems,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(*inputs, *[jnp.asarray(t_arr) for t_arr, _, _ in tables])


def _cfft_composite_v2(xre, xim, n, forward):
    """Two-kernel composite (natural order in, natural order out — the
    composite's 'unordered' layout is the ordered one, a per-plan layout
    choice as in the reference, where SSE and AVX internal layouts also
    differ)."""
    a, c = _split_large(n)
    b = xre.shape[0]
    n1a, n1c = a // LANES, c // LANES
    tc = _v2_tile(b, a, c)
    ta = _v2_tile(b, c, a)
    table = _v2_table

    if forward:
        rad_a, (stwa_re, stwa_im), (dfta_re, dfta_im) = _tables_fwd_folded(a)
        rad_c, (stwc_re, stwc_im), (dftc_re, dftc_im) = _tables_fwd_folded(c)
        twr, twi = _large_twiddle(n, True, folded=False)  # (C, A)
        k1 = functools.partial(_cfft_v2_l1_kernel, n1=n1a, radices=rad_a)
        mid_r, mid_i = _v2_call(
            k1,
            [xre.reshape(b, a, c), xim.reshape(b, a, c)],
            [table(stwa_re), table(stwa_im), table(dfta_re), table(dfta_im)],
            c // tc,
            (b, a, tc), lambda k: (0, 0, k),
            (b, tc, a), lambda k: (0, k, 0),
            [(b, c, a)],
        )
        k2 = functools.partial(_cfft_v2_l2_kernel, n1=n1c, radices=rad_c)
        yr, yi = _v2_call(
            k2,
            [mid_r, mid_i],
            [
                (twr, (c, ta), lambda k: (0, k)),
                (twi, (c, ta), lambda k: (0, k)),
                table(stwc_re), table(stwc_im), table(dftc_re), table(dftc_im),
            ],
            a // ta,
            (b, c, ta), lambda k: (0, 0, k),
            (b, c, ta), lambda k: (0, 0, k),
            [(b, c, a)],
            # alias measured OFF here: level-2 aliasing costs ~5% at 2^18
            # (fwd 504 -> 531us, rt 933 -> 964 — scratch/logs/
            # r5_alias_ab2.log), likely lost L1/L2 pipelining; the
            # standalone-kernel win does not transfer to the chain.
        )
        return yr.reshape(b, n), yi.reshape(b, n)

    rad_c, (stwc_re, stwc_im), (mtwc_re, mtwc_im), (dftc_re, dftc_im) = _tables(c, False)
    rad_a, (stwa_re, stwa_im), (mtwa_re, mtwa_im), (dfta_re, dfta_im) = _tables(a, False)
    twr, twi = _large_twiddle(n, False, folded=False)  # conj slab
    k2r = functools.partial(_cfft_v2_l2_rev_kernel, n1=n1c, radices=rad_c)
    mid_r, mid_i = _v2_call(
        k2r,
        [xre.reshape(b, c, a), xim.reshape(b, c, a)],
        [
            (twr, (c, ta), lambda k: (0, k)),
            (twi, (c, ta), lambda k: (0, k)),
            table(stwc_re), table(stwc_im), table(mtwc_re), table(mtwc_im),
            table(dftc_re), table(dftc_im),
        ],
        a // ta,
        (b, c, ta), lambda k: (0, 0, k),
        (b, c, ta), lambda k: (0, 0, k),
        [(b, c, a)],
        # alias measured OFF (see forward level 2).
    )
    k1r = functools.partial(_cfft_v2_l1_rev_kernel, n1=n1a, radices=rad_a)
    yr, yi = _v2_call(
        k1r,
        [mid_r, mid_i],
        [
            table(stwa_re), table(stwa_im), table(mtwa_re), table(mtwa_im),
            table(dfta_re), table(dfta_im),
        ],
        c // tc,
        (b, tc, a), lambda k: (0, k, 0),
        (b, a, tc), lambda k: (0, 0, k),
        [(b, a, c)],
    )
    return yr.reshape(b, n), yi.reshape(b, n)


def _cfft_composite_v2_batched(xre, xim, n, forward):
    """v2 for any batch: the stage blocks cap VMEM per batch row, so
    batches beyond _v2_batch_cap run the same two kernels over trace-time
    batch chunks (identical natural-order layout per chunk; the concat is
    one extra HBM pass against the v1 chain's ~5 extra round trips)."""
    return _batch_chunked(
        lambda r, i: _cfft_composite_v2(r, i, n, forward),
        (xre, xim),
        _v2_batch_cap(n),
    )


def _cfft_pair_large(xre, xim, n, forward, ordered):
    cap = _v2_batch_cap(n)
    if cap:
        # v2's natural-order output serves both entries: it IS the ordered
        # layout, and the plan's "unordered" layout is defined as the same
        # thing (contractual per PLAN, like the reference's backend-private
        # z-domain layouts — a batch-gated v1 fallback would emit the
        # digit-transposed order for large batches and silently corrupt
        # cross-batch convolve compositions; round-3 review). Batches past
        # the VMEM cap run batch-chunked: probe H (2^18 b=64 round trip)
        # measured chunked v2 at 7.9 vs v1's 5.1 Gs/s/dir — the chunk
        # concat costs one HBM pass against the v1 chain's ~5 extra
        # round trips.
        return _cfft_composite_v2_batched(xre, xim, n, forward)
    return _cfft_pair_large_v1(xre, xim, n, forward, ordered)


def _cfft_pair_large_v1(xre, xim, n, forward, ordered):
    a, c = _split_large(n)
    b = xre.shape[0]
    # Ordered path: ordered sub-FFTs (each reorder is a cheap per-factor
    # digit transpose) + ONE plain (A, C) <-> (C, A) transpose. The
    # alternative — unordered sub-FFTs + a single 5D digit-reversing
    # transpose — measured ~43x over bandwidth (XLA lowers it as a
    # gather); see NOTES.md. A direct-DFT level A emits natural bins even
    # under ordered=False (its layout choice), so the k1 fold only applies
    # when level A is a Stockham kernel.
    folded = (not ordered) and not _small_dispatch(a)
    twr, twi = (jnp.asarray(t) for t in _large_twiddle(n, forward, folded=folded))
    direction = FFT_FORWARD if forward else FFT_BACKWARD

    def col_major(z):  # (B, A, C) -> (B*C, A)
        return jnp.swapaxes(z.reshape(b, a, c), 1, 2).reshape(b * c, a)

    if forward:
        # FFTs of length A down the columns ...
        fr, fi = _cfft_pair(col_major(xre), col_major(xim), a, direction, ordered)
        fr = fr.reshape(b, c, a)
        fi = fi.reshape(b, c, a)
        # ... four-step twiddle ...
        fr, fi = fr * twr - fi * twi, fr * twi + fi * twr
        # ... FFTs of length C along the rows.
        fr = jnp.swapaxes(fr, 1, 2).reshape(b * a, c)
        fi = jnp.swapaxes(fi, 1, 2).reshape(b * a, c)
        gr, gi = _cfft_pair(fr, fi, c, direction, ordered)
        gr = gr.reshape(b, a, c)
        gi = gi.reshape(b, a, c)
        if ordered:
            # natural bin order k = k1 + A*k2 is k2-major: one transpose.
            gr = jnp.swapaxes(gr, 1, 2)
            gi = jnp.swapaxes(gi, 1, 2)
        return gr.reshape(b, n), gi.reshape(b, n)

    # Backward: mirror of the forward chain.
    if ordered:
        xre = jnp.swapaxes(xre.reshape(b, c, a), 1, 2).reshape(b, n)
        xim = jnp.swapaxes(xim.reshape(b, c, a), 1, 2).reshape(b, n)
    gr, gi = _cfft_pair(
        xre.reshape(b * a, c), xim.reshape(b * a, c), c, direction, ordered
    )
    gr = jnp.swapaxes(gr.reshape(b, a, c), 1, 2)  # (B, C, A) axes (c, j)
    gi = jnp.swapaxes(gi.reshape(b, a, c), 1, 2)
    gr, gi = gr * twr - gi * twi, gr * twi + gi * twr
    fr, fi = _cfft_pair(
        gr.reshape(b * c, a), gi.reshape(b * c, a), a, direction, ordered
    )
    fr = jnp.swapaxes(fr.reshape(b, c, a), 1, 2).reshape(b, n)  # n = a*C + c
    fi = jnp.swapaxes(fi.reshape(b, c, a), 1, 2).reshape(b, n)
    return fr, fi


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cfft_pair(xre, xim, n, direction, ordered):
    """Complex FFT on planes with an exact adjoint rule.

    Pallas calls are opaque to JAX autodiff, so the engine defines its own
    VJP. On (re, im) planes the transform is REAL-linear with a symmetric
    DFT matrix, which gives the clean identity: the transpose of the
    {forward, backward} x {ordered, unordered} map is the opposite
    direction with the SAME ordering flag (the engine-internal permutation
    P transposes to P^-1, which is exactly what the reverse pipeline
    consumes). Holds verbatim for the composite large-N path."""
    return _cfft_pair_impl(xre, xim, n, direction, ordered)


def _cfft_pair_fwd(xre, xim, n, direction, ordered):
    return _cfft_pair_impl(xre, xim, n, direction, ordered), None


def _cfft_pair_bwd(n, direction, ordered, _res, ct):
    odir = FFT_BACKWARD if direction == FFT_FORWARD else FFT_FORWARD
    return _cfft_pair_impl(ct[0], ct[1], n, odir, ordered)


_cfft_pair.defvjp(_cfft_pair_fwd, _cfft_pair_bwd)


def _cfft_pair_impl(xre, xim, n, direction, ordered):
    forward = direction == FFT_FORWARD
    if _small_dispatch(n):
        # Direct-DFT matmul; natural bin order either way (ordered flag moot).
        return _small_cfft_pair(xre, xim, n, forward)
    if n > _MAX_N or not _is_smooth_multiple(n):
        # Above the single kernel, or a medium smooth non-multiple of 128
        # (576, 960, ...): the two-level composite (direct-DFT levels for
        # the medium sizes).
        return _cfft_pair_large(xre, xim, n, forward, ordered)
    in_kernel = ordered and _ordered_in_kernel(n)
    if forward:
        yre, yim = _pallas_cfft_pair(
            xre, xim, n, forward=True, reverse_order=False,
            ordered_io=in_kernel,
        )
        if ordered and not in_kernel:
            yre = _digit_transpose(yre, n, inverse=False)
            yim = _digit_transpose(yim, n, inverse=False)
        return yre, yim
    # Backward: bring input into (k1, k2) layout if it is in natural order,
    # then run the mirrored pipeline (emits natural time order directly).
    if ordered and not in_kernel:
        xre = _digit_transpose(xre, n, inverse=True)
        xim = _digit_transpose(xim, n, inverse=True)
    return _pallas_cfft_pair(
        xre, xim, n, forward=False, reverse_order=True, ordered_io=in_kernel
    )


def _cfft_complex(x, plan, direction, ordered):
    n = plan.n if plan.kind == FFT_COMPLEX else plan.cfft_n
    x = x.astype(jnp.complex64)
    xf, batch_shape = _flatten_batch(x)
    yre, yim = _cfft_pair(xf.real, xf.imag, n, direction, ordered)
    return jax.lax.complex(yre, yim).reshape(*batch_shape, n)


def cfft(x, plan=None, direction=FFT_FORWARD):
    """Ordered complex FFT (pallas engine). Unscaled both directions."""
    n = x.shape[-1]
    plan = plan or cached_plan(n, FFT_COMPLEX)
    return _cfft_complex(x, plan, direction, ordered=True)


def cfft_planes(re, im, plan=None, direction=FFT_FORWARD, ordered: bool = True):
    """Complex FFT on SoA float32 planes -> (re, im) planes.

    The engine-native complex interface: complex64 arrays are interleaved
    in XLA memory, so the complex wrappers pay a relayout on each side of
    the kernel; planes go straight in. (Also the only complex format the
    axon tunnel can transfer to the host.)"""
    n = re.shape[-1]
    rf, batch_shape = _flatten_batch(re.astype(jnp.float32))
    if_, _ = _flatten_batch(im.astype(jnp.float32))
    yre, yim = _cfft_pair(rf, if_, n, direction, ordered)
    return yre.reshape(*batch_shape, n), yim.reshape(*batch_shape, n)


def cfft_unordered(x, plan=None, direction=FFT_FORWARD):
    """Complex FFT in this engine's internal (digit-transposed) order."""
    n = x.shape[-1]
    plan = plan or cached_plan(n, FFT_COMPLEX)
    return _cfft_complex(x, plan, direction, ordered=False)


# Fused direct-real kernel bound: the real kernel runs the full-length
# complex pipeline internally, so it shares the single-kernel VMEM limit.
_MAX_FUSED_REAL = _MAX_N


def _fused_real_ok(n: int) -> bool:
    """n is served by a single fused real kernel (small direct or Stockham
    form); everything else goes through the direct-real composite."""
    return _small_dispatch(n) or (n <= _MAX_FUSED_REAL and _is_smooth_multiple(n))


def rfft_packed(x, plan=None, ordered: bool = True):
    """Real FFT -> packed SoA half-spectrum planes ((..., N/2) f32 x2).

    The engine's fastest real path: one fused kernel, N·f32 in / N·f32 out
    per row. ``ordered=False`` leaves bins in the engine-internal
    digit-transposed order (pairs with ``irfft_packed(ordered=False)`` and
    the packed convolve — the fft_transform_unordered capability,
    /root/reference/chowdsp_fft.h:140-154). Sizes beyond the fused-kernel
    VMEM bound fall back to the half-complex split over the (possibly
    composite) complex engine; their "unordered" layout is the ordered one."""
    n = x.shape[-1]
    m = n // 2
    if not _fused_real_ok(n):
        # Two-level direct-real composite (always ordered; a legal choice
        # for the "unordered" layout as well): sizes beyond the fused
        # kernel's VMEM bound AND the medium smooth non-multiples of 128.
        return _rfft_direct_composite(x)
    xf, batch_shape = _flatten_batch(x.astype(jnp.float32))
    yre, yim = _pallas_rfft_packed(xf, n, ordered)
    return yre.reshape(*batch_shape, m), yim.reshape(*batch_shape, m)


def irfft_packed(yre, yim, plan=None, ordered: bool = True):
    """Unscaled inverse of :func:`rfft_packed` -> (..., N) f32."""
    m = yre.shape[-1]
    n = 2 * m
    if not _fused_real_ok(n):
        return _irfft_direct_composite(yre, yim)
    rf, batch_shape = _flatten_batch(yre.astype(jnp.float32))
    if_, _ = _flatten_batch(yim.astype(jnp.float32))
    x = _pallas_irfft_packed(rf, if_, n, ordered)
    return x.reshape(*batch_shape, n)


def _rfft_via_half(x, plan=None):
    """Alternate large-N real path (retained as a tested cross-check for
    the direct-real composite, which replaced it in dispatch — 3-7x
    faster): real FFT via BATCH pairing (used above the fused kernel's
    size bound): two real rows become one full-length complex row,
    z = x[2b] + i*x[2b+1], and one cfft serves both — the classic
    two-for-one identity A = (Z + conj(Zrev))/2, B = (Z - conj(Zrev))/2i.

    Pairing across the *batch* axis instead of even/odd samples is the
    TPU-critical choice: the sample-interleaved pack is a stride-2 minor
    relayout that measured 2.1ms at N=2^19 B=8 — 5x the FFT itself —
    while batch pairing is whole-row slices (benchmarks/NOTES.md)."""
    n = x.shape[-1]
    del plan  # no split twiddles needed in the two-signal form
    za_re, za_im, zb_re, zb_im, b, batch_shape = _rfft_pair_planes(x)
    out = jnp.stack(
        [jax.lax.complex(za_re, za_im), jax.lax.complex(zb_re, zb_im)], axis=1
    ).reshape(-1, n // 2 + 1)[:b]
    return out.reshape(*batch_shape, n // 2 + 1)


@functools.lru_cache(maxsize=16)
def _direct_real_tables(n: int):
    """Tables for the composite direct-real forward: N = A*C, level-1 real
    FFTs of length A down the columns, level-2 complex FFTs of length C.

      X[k1 + A*k2] = sum_c W_C^{-k2 c} W_N^{-k1 c} F_c[k1],
      F_c = rfft_A of the stride-C subsequence x[a*C + c]

    Returns (a, c, tw (A/2-1, C) for k1 in [1, A/2), nyt (1, C) =
    W_{2C}^{-c} — the half-bin modulation that turns the Nyquist row's
    shifted transform into a plain C-FFT)."""
    a, c = _split_large(n, real=True)
    cc = np.arange(c, dtype=np.float64)[None, :]
    k1 = np.arange(1, a // 2, dtype=np.float64)[:, None]
    ang = -2.0 * np.pi * (k1 * cc) / float(n)
    tw = (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))
    ang2 = -np.pi * cc / float(c)
    nyt = (np.cos(ang2).astype(np.float32), np.sin(ang2).astype(np.float32))
    return a, c, tw, nyt


# ---------------------------------------------------------------------------
# Real composite v2 (round 3): same two-kernels-per-direction structure as
# the complex composite v2. Forward: the column-blocked fused real kernel
# (level 1) -> _cfft_v2_l2_kernel with the W_N^{-k1 c} twiddle as its slab
# (level 2, ordered C bins in place) -> Hermitian assembly. The DC and
# Nyquist lines (column 0 of the packed grid — the only column needing the
# half-bin Nyquist modulation before its C-FFT) are handled as two tiny
# XLA-level length-C transforms; the kernel's column-0 output is ignored.
# Inverse mirrors it: disassembly -> _cfft_v2_l2_rev_kernel (conj slab) ->
# column-blocked fused real inverse emitting natural time. ~3 HBM round
# trips per direction vs the v1 chain's ~6.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _rdc_l2_twiddle(n: int, forward: bool):
    """(C, A/2) level-2 twiddle W_N^{sgn k1 c} for k1 in [0, A/2) — column 0
    is identically (1, 0), so the DC/Nyquist column rides the kernel
    untouched (and unused)."""
    a, c = _split_large(n, real=True)
    sgn = -1.0 if forward else 1.0
    cc = np.arange(c, dtype=np.float64)[:, None]
    k1 = np.arange(a // 2, dtype=np.float64)[None, :]
    ang = sgn * 2.0 * np.pi * (cc * k1) / float(n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rdc_v2_supported(n: int, b: int) -> bool:
    try:
        a, c = _split_large(n, real=True)
    except InvalidSizeError:
        return False
    if (a // 2) % LANES:
        return False
    return (
        _cols_supported(b, a, c)
        and _v2_tile(b, c, a // 2) > 0
        and _v2_tile(b, a, c) > 0
    )


def _rdc_batch_cap(n: int) -> int:
    """Real-composite analog of :func:`_v2_batch_cap`: the largest batch
    for which the v2 stage blocks (column-blocked level-1 and both
    level-2 kernels) fit their VMEM caps; bigger batches run the same
    kernels over trace-time batch chunks instead of falling back to the
    ~6-round-trip v1 chain. Both paths emit the same ORDERED planes, so
    unlike the complex case this is purely a perf choice."""
    try:
        a, c = _split_large(n, real=True)
    except InvalidSizeError:
        return 0
    if (a // 2) % LANES or c % LANES or not _is_smooth_multiple(a):
        return 0
    row_bytes = 4 * LANES
    return min(_V2_BLOCK_BYTES // (a * row_bytes), _V2_BLOCK_BYTES // (c * row_bytes))


def _batch_chunked(fn, arrays, cap):
    """Apply fn over trace-time batch chunks of size <= cap, concatenating
    the outputs (tuple-valued fns concat per element). Chunks are BALANCED
    (sizes differ by at most 1) rather than cap-sized-plus-remainder: a
    ragged tail (e.g. 48 = 32 + 16) would compile an extra Mosaic kernel
    variant per stage and run a near-empty grid pass, while 24 + 24 is one
    variant at the same chunk count."""
    b = arrays[0].shape[0]
    if b <= cap:
        return fn(*arrays)
    n_chunks = -(-b // cap)
    edges = [round(i * b / n_chunks) for i in range(n_chunks + 1)]
    outs = [fn(*(arr[s:e] for arr in arrays)) for s, e in zip(edges, edges[1:])]
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate(parts, axis=0) for parts in zip(*outs))
    return jnp.concatenate(outs, axis=0)


def _rfft_direct_composite_v2(xf, n):
    a, c = _split_large(n, real=True)
    b = xf.shape[0]
    half_a = a // 2
    n1c = c // LANES
    c2 = c // 2
    _, _, _, (nytr, nyti) = _direct_real_tables(n)

    # Level 1: column-blocked fused real rfft -> (B, C, A/2) packed planes.
    pre, pim = _rfft_packed_cols_impl(xf.reshape(b, a, c), a)

    # DC / Nyquist lines from column 0 (DC real in re, Nyquist real in im).
    dcrow = pre[:, :, 0]
    nyrow = pim[:, :, 0]
    lin_re = jnp.concatenate([dcrow, nyrow * jnp.asarray(nytr)], axis=0)
    lin_im = jnp.concatenate([jnp.zeros_like(dcrow), nyrow * jnp.asarray(nyti)], axis=0)
    lr, li = _cfft_pair(lin_re, lin_im, c, FFT_FORWARD, True)
    g0r, g0i = lr[:b], li[:b]
    gnyr, gnyi = lr[b:], li[b:]

    # Level 2: ordered C-FFTs down the columns, twiddle in the kernel slab.
    rad_c, (stwc_re, stwc_im), (dftc_re, dftc_im) = _tables_fwd_folded(c)
    twr, twi = _rdc_l2_twiddle(n, True)
    ta2 = _v2_tile(b, c, half_a)
    k2 = functools.partial(_cfft_v2_l2_kernel, n1=n1c, radices=rad_c)
    gr, gi = _v2_call(
        k2,
        [pre, pim],
        [
            (twr, (c, ta2), lambda k: (0, k)),
            (twi, (c, ta2), lambda k: (0, k)),
            _v2_table(stwc_re), _v2_table(stwc_im),
            _v2_table(dftc_re), _v2_table(dftc_im),
        ],
        half_a // ta2,
        (b, c, ta2), lambda k: (0, 0, k),
        (b, c, ta2), lambda k: (0, 0, k),
        [(b, c, half_a)],
    )

    # Hermitian assembly (same formulas as v1, already in (B, C, ...) layout).
    first_r = jnp.concatenate([g0r[:, :c2, None], gr[:, :c2, 1:], gnyr[:, :c2, None]], axis=2)
    first_i = jnp.concatenate([g0i[:, :c2, None], gi[:, :c2, 1:], gnyi[:, :c2, None]], axis=2)
    sec_r = jnp.flip(jnp.flip(gr[:, c2:, 1:], axis=1), axis=2)
    sec_i = -jnp.flip(jnp.flip(gi[:, c2:, 1:], axis=1), axis=2)
    out_r = jnp.concatenate([first_r, sec_r], axis=2).reshape(b, n // 2)
    out_i = jnp.concatenate([first_i, sec_i], axis=2).reshape(b, n // 2)
    nyq = g0r[:, c2][:, None]  # global Nyquist X[N/2] = X[0 + A*C/2] = G_dc[C/2], real
    col = jax.lax.broadcasted_iota(jnp.int32, out_i.shape, 1)
    out_i = jnp.where(col == 0, nyq, out_i)
    return out_r, out_i


def _irfft_direct_composite_v2(rf, if_, n):
    a, c = _split_large(n, real=True)
    b = rf.shape[0]
    half_a = a // 2
    n1c = c // LANES
    c2 = c // 2
    _, _, _, (nytr, nyti) = _direct_real_tables(n)

    nyq = if_[:, :1]  # X[N/2]
    col = jax.lax.broadcasted_iota(jnp.int32, if_.shape, 1)
    if_ = jnp.where(col == 0, 0.0, if_)
    pr = rf.reshape(b, c2, a)
    pi = if_.reshape(b, c2, a)

    # Rebuild the level-2 spectral grid G (B, C, A/2) + the Nyquist line
    # (see the v1 docstring for the Hermitian bookkeeping; identical math).
    mid1_r = pr[:, :, 1:half_a]
    mid1_i = pi[:, :, 1:half_a]
    mid2_r = jnp.flip(jnp.flip(pr[:, :, half_a + 1 :], axis=1), axis=2)
    mid2_i = -jnp.flip(jnp.flip(pi[:, :, half_a + 1 :], axis=1), axis=2)
    mids_r = jnp.concatenate([mid1_r, mid2_r], axis=1)  # (B, C, A/2-1)
    mids_i = jnp.concatenate([mid1_i, mid2_i], axis=1)
    # column 0 (DC line): direct rows then conj-flipped rows with the
    # packed global Nyquist at k2 = C/2.
    col0_r = jnp.concatenate(
        [pr[:, :, 0], jnp.concatenate([nyq, jnp.flip(pr[:, 1:, 0], axis=1)], axis=1)],
        axis=1,
    )  # (B, C)
    col0_i = jnp.concatenate(
        [pi[:, :, 0], jnp.concatenate([jnp.zeros_like(nyq), -jnp.flip(pi[:, 1:, 0], axis=1)], axis=1)],
        axis=1,
    )
    # Nyquist line (column A/2): direct rows then conj-flipped rows.
    ny_r = jnp.concatenate([pr[:, :, half_a], jnp.flip(pr[:, :, half_a], axis=1)], axis=1)
    ny_i = jnp.concatenate([pi[:, :, half_a], -jnp.flip(pi[:, :, half_a], axis=1)], axis=1)

    # Tiny line transforms: ny_c = the level-1 Nyquist row in c-space
    # (backward C-FFT + conj half-bin modulation, v1's formula), then
    # F = fwd(ny_c)/C so the level-2 kernel's column-0 inverse emits
    # exactly (DC_c, ny_c) — no post-kernel masked rewrite pass.
    ur, ui = _cfft_pair(ny_r, ny_i, c, FFT_BACKWARD, True)
    ny_c = ur * jnp.asarray(nytr) + ui * jnp.asarray(nyti)  # (B, C), real
    fr, fi = _cfft_pair(ny_c / float(c), jnp.zeros_like(ny_c), c, FFT_FORWARD, True)
    fed_r = col0_r - fi
    fed_i = col0_i + fr
    grid_re = jnp.concatenate([fed_r[:, :, None], mids_r], axis=2)  # (B, C, A/2)
    grid_im = jnp.concatenate([fed_i[:, :, None], mids_i], axis=2)

    # Level 2 inverse: backward C-FFTs down the columns + conj twiddle slab.
    rad_c, (stwc_re, stwc_im), (mtwc_re, mtwc_im), (dftc_re, dftc_im) = _tables(c, False)
    twr, twi = _rdc_l2_twiddle(n, False)
    ta2 = _v2_tile(b, c, half_a)
    k2r = functools.partial(_cfft_v2_l2_rev_kernel, n1=n1c, radices=rad_c)
    pre, pim = _v2_call(
        k2r,
        [grid_re, grid_im],
        [
            (twr, (c, ta2), lambda k: (0, k)),
            (twi, (c, ta2), lambda k: (0, k)),
            _v2_table(stwc_re), _v2_table(stwc_im),
            _v2_table(mtwc_re), _v2_table(mtwc_im),
            _v2_table(dftc_re), _v2_table(dftc_im),
        ],
        half_a // ta2,
        (b, c, ta2), lambda k: (0, 0, k),
        (b, c, ta2), lambda k: (0, 0, k),
        [(b, c, half_a)],
    )

    # Level 1: column-blocked fused real inverse -> (B, A, C) natural time.
    x3 = _irfft_packed_cols_impl(pre, pim, a)
    return x3.reshape(b, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _rdc_fwd(xf, n):
    """v2 real-composite forward with the exact packed-adjoint rule (the
    same weighting identity as the single-kernel packed pair)."""
    return _rfft_direct_composite_v2(xf, n)


def _rdc_fwd_fwd(xf, n):
    return _rfft_direct_composite_v2(xf, n), None


def _rdc_fwd_bwd(n, _res, ct):
    sre, sim = _halfspec_weight(ct[0], ct[1], n, 0.5)
    return (_irfft_direct_composite_v2(sre, sim, n),)


_rdc_fwd.defvjp(_rdc_fwd_fwd, _rdc_fwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rdc_inv(yre, yim, n):
    return _irfft_direct_composite_v2(yre, yim, n)


def _rdc_inv_fwd(yre, yim, n):
    return _irfft_direct_composite_v2(yre, yim, n), None


def _rdc_inv_bwd(n, _res, ct):
    re, im = _rfft_direct_composite_v2(ct, n)
    return _halfspec_weight(re, im, n, 2.0)


_rdc_inv.defvjp(_rdc_inv_fwd, _rdc_inv_bwd)


def _rfft_direct_composite(x):
    """Large-N real forward as a two-level DIRECT-real composite: the fused
    real kernel does level 1 (half the data volume of a complex level 1),
    level 2 runs only the A/2+1 Hermitian-independent columns. Replaces the
    batch-paired half-complex split on the forward side — that path's
    full-length complex transform plus reversal/combine passes measured
    ~2x this one's traffic. Returns ORDERED packed planes (..., N/2).

    Dispatches to the two-kernel v2 when tiles fit (round 3); the v1 chain
    remains as the fallback and cross-check."""
    n = x.shape[-1]
    xf, batch_shape = _flatten_batch(x.astype(jnp.float32))
    cap = _rdc_batch_cap(n)
    if cap and _rdc_v2_supported(n, min(xf.shape[0], cap)):
        out_r, out_i = _batch_chunked(lambda v: _rdc_fwd(v, n), (xf,), cap)
        m = n // 2
        return out_r.reshape(*batch_shape, m), out_i.reshape(*batch_shape, m)
    return _rfft_direct_composite_v1(x)


def _irfft_direct_composite(yre, yim):
    """Unscaled inverse of :func:`_rfft_direct_composite` (v2 two-kernel
    path when supported, v1 fallback)."""
    n = 2 * yre.shape[-1]
    rf, batch_shape = _flatten_batch(yre.astype(jnp.float32))
    if_, _ = _flatten_batch(yim.astype(jnp.float32))
    cap = _rdc_batch_cap(n)
    if cap and _rdc_v2_supported(n, min(rf.shape[0], cap)):
        out = _batch_chunked(lambda r, i: _rdc_inv(r, i, n), (rf, if_), cap)
        return out.reshape(*batch_shape, n)
    return _irfft_direct_composite_v1(yre, yim)


def _rfft_direct_composite_v1(x):
    """v1 chain (explicit transposes + standard kernels); the fallback for
    shapes whose v2 tiles do not fit VMEM, and the numeric cross-check."""
    n = x.shape[-1]
    a, c, (twr, twi), (nytr, nyti) = _direct_real_tables(n)
    xf, batch_shape = _flatten_batch(x.astype(jnp.float32))
    b = xf.shape[0]
    half_a = a // 2

    # Level 1: real FFTs of the stride-C subsequences, read column-blocked
    # straight from the (B, A, C) view — the input transpose happens as an
    # in-VMEM relayout inside the kernel instead of a standalone HBM pass
    # (~74us of the 540us total at 2^20 before this; NOTES.md round 2).
    # custom_vjp wrappers (NOT _impl): the pieces' VJPs compose to the
    # composite gradient; the raw pallas_call has no autodiff rule.
    if _cols_supported(b, a, c):
        pre, pim = _rfft_packed_cols(xf.reshape(b, a, c), a)  # (B, C, A/2) x2
        pre = jnp.swapaxes(pre, 1, 2)  # (B, A/2, C); fuses into the twiddle
        pim = jnp.swapaxes(pim, 1, 2)
    else:  # batch too large for the folded block: explicit transpose path
        xt = jnp.swapaxes(xf.reshape(b, a, c), 1, 2).reshape(b * c, a)
        pre, pim = _pallas_rfft_packed(xt, a, True)
        pre = jnp.swapaxes(pre.reshape(b, c, half_a), 1, 2)
        pim = jnp.swapaxes(pim.reshape(b, c, half_a), 1, 2)

    # Level-2 input rows: DC (real), k1 = 1..A/2-1 (twiddled complex),
    # Nyquist (real, pre-modulated by W_{2C}^{-c} so its half-bin-shifted
    # transform becomes a plain C-FFT).
    dc = pre[:, :1, :]
    ny = pim[:, :1, :]
    mr = pre[:, 1:, :] * twr - pim[:, 1:, :] * twi
    mi = pre[:, 1:, :] * twi + pim[:, 1:, :] * twr
    re2 = jnp.concatenate([dc, mr, ny * nytr], axis=1)  # (B, A/2+1, C)
    im2 = jnp.concatenate([jnp.zeros_like(dc), mi, ny * nyti], axis=1)

    # Level 2: ordered complex FFTs over c. Row r of G holds X[r + A*k2]
    # (row A/2 is the Nyquist-derived k1 = A/2 line).
    gr, gi = _cfft_pair(re2.reshape(-1, c), im2.reshape(-1, c), c, FFT_FORWARD, True)
    gr = jnp.swapaxes(gr.reshape(b, half_a + 1, c), 1, 2)  # (B, C, A/2+1)
    gi = jnp.swapaxes(gi.reshape(b, half_a + 1, c), 1, 2)

    # Assembly: bins k = k1 + A*k2 for k < N/2 need k2 < C/2 rows with all
    # A k1 values; k1 in (A/2, A) comes from Hermitian symmetry,
    # X[k1 + A*k2] = conj(G[A-k1, C-1-k2]).
    first_r = gr[:, : c // 2, :]
    first_i = gi[:, : c // 2, :]
    sec_r = jnp.flip(jnp.flip(gr[:, c // 2 :, 1:half_a], axis=1), axis=2)
    sec_i = -jnp.flip(jnp.flip(gi[:, c // 2 :, 1:half_a], axis=1), axis=2)
    out_r = jnp.concatenate([first_r, sec_r], axis=2).reshape(b, n // 2)
    out_i = jnp.concatenate([first_i, sec_i], axis=2).reshape(b, n // 2)
    # Pack the global Nyquist X[N/2] = G[0, C/2] (real) into im[0].
    nyq = gr[:, c // 2, 0][:, None]
    col = jax.lax.broadcasted_iota(jnp.int32, out_i.shape, 1)
    out_i = jnp.where(col == 0, nyq, out_i)
    m = n // 2
    return out_r.reshape(*batch_shape, m), out_i.reshape(*batch_shape, m)


def _irfft_direct_composite_v1(yre, yim):
    """Mirror of :func:`_rfft_direct_composite_v1` (unscaled inverse):
    rebuild the level-2 spectra G[k1 <= A/2, all k2] from the ordered
    packed planes via Hermitian symmetry, backward C-FFTs, un-twiddle,
    then the fused packed real inverse for level 1."""
    m = yre.shape[-1]
    n = 2 * m
    a, c, (twr, twi), (nytr, nyti) = _direct_real_tables(n)
    rf, batch_shape = _flatten_batch(yre.astype(jnp.float32))
    if_, _ = _flatten_batch(yim.astype(jnp.float32))
    b = rf.shape[0]
    half_a = a // 2

    nyq = if_[:, :1]  # X[N/2]
    col = jax.lax.broadcasted_iota(jnp.int32, if_.shape, 1)
    if_ = jnp.where(col == 0, 0.0, if_)
    pr = rf.reshape(b, c // 2, a)  # rows k2 < C/2: [k1 0..A/2 | hermitian part]
    pi = if_.reshape(b, c // 2, a)

    # G[k2 < C/2, k1 <= A/2]: direct columns.
    g1r = pr[:, :, : half_a + 1]
    g1i = pi[:, :, : half_a + 1]
    # G[k2 >= C/2, k1 <= A/2] via X[k1 + A*k2] = conj(X[(A-k1) + A*(C-1-k2)]):
    # columns A-k1 in (A/2, A) of row C-1-k2 — i.e. the hermitian part
    # flipped on both axes — except k1 = 0, which wraps to column 0 of row
    # C-k2, and k2 = C/2 whose k1=0 slot is the packed Nyquist.
    tail_r = jnp.flip(jnp.flip(pr[:, :, half_a + 1 :], axis=1), axis=2)
    tail_i = -jnp.flip(jnp.flip(pi[:, :, half_a + 1 :], axis=1), axis=2)
    # columns k1 = 1..A/2-1 of rows k2 = C/2+1..C-1 ... rows C/2..C-1:
    # tail covers k2' = C/2..C-1? flip(axis=1) maps row r -> C/2-1-r, i.e.
    # k2 = C-1-(C/2-1-r)... assemble explicitly below.
    # k1 = A/2 column for k2 >= C/2: conj(G[A/2, C-1-k2]) = conj of the
    # DIRECT A/2 column flipped on k2.
    colA2_r = jnp.flip(pr[:, :, half_a : half_a + 1], axis=1)
    colA2_i = -jnp.flip(pi[:, :, half_a : half_a + 1], axis=1)
    # k1 = 0 column for k2 > C/2: conj(G[0, C-k2]) = conj of rows 1..C/2-1
    # of the direct DC column, flipped; k2 = C/2 is the real Nyquist.
    col0_hi_r = jnp.flip(pr[:, 1:, :1], axis=1)
    col0_hi_i = -jnp.flip(pi[:, 1:, :1], axis=1)

    # Build G rows k2 = C/2 .. C-1 as (B, C/2, A/2+1):
    #   k2 = C/2 row: [Nyq, conj-part row C/2-1... ] — handled by the same
    #   formulas: for k1 >= 1 it is conj(X[(A-k1) + A*(C/2-1)]) etc.
    ghi_mid_r = tail_r  # (B, C/2, A/2-1): k1 = 1..A/2-1, k2 = C/2..C-1?
    # Row mapping check: we need rows in ascending k2 = C/2..C-1 order.
    # tail_r[b, r, j] = pr[b, C/2-1-r, a-1-j'] with j' over the hermitian
    # block: pr[:, :, half_a+1+jj] holds X[(A/2+1+jj) + A*k2]; flipping
    # jj gives k1 = 1..A/2-1 ascending, and flipping rows gives
    # C-1-k2_src = C/2..C-1 ascending. So ghi_mid_r rows ARE k2 ascending.
    g2r = jnp.concatenate(
        [
            jnp.concatenate([nyq[:, :, None], col0_hi_r], axis=1),  # k1=0 col
            ghi_mid_r,
            colA2_r,
        ],
        axis=2,
    )
    g2i = jnp.concatenate(
        [
            jnp.concatenate([jnp.zeros_like(nyq)[:, :, None], col0_hi_i], axis=1),
            tail_i,
            colA2_i,
        ],
        axis=2,
    )
    gr = jnp.concatenate([g1r, g2r], axis=1)  # (B, C, A/2+1)
    gi = jnp.concatenate([g1i, g2i], axis=1)

    # Backward C-FFTs over k2 for every k1 row.
    ur, ui = _cfft_pair(
        jnp.swapaxes(gr, 1, 2).reshape(-1, c),
        jnp.swapaxes(gi, 1, 2).reshape(-1, c),
        c,
        FFT_BACKWARD,
        True,
    )
    ur = ur.reshape(b, half_a + 1, c)
    ui = ui.reshape(b, half_a + 1, c)

    # Un-twiddle (conj of the forward tables) and repack level-1 planes.
    dc = ur[:, :1, :]  # imag analytically 0
    mr = ur[:, 1:half_a, :] * twr + ui[:, 1:half_a, :] * twi
    mi = -ur[:, 1:half_a, :] * twi + ui[:, 1:half_a, :] * twr
    nyr = ur[:, half_a:, :] * nytr + ui[:, half_a:, :] * nyti  # imag ~0
    pre = jnp.concatenate([dc, mr], axis=1)  # (B, A/2, C) re plane
    pim = jnp.concatenate([nyr, mi], axis=1)  # im plane, NY packed in row 0
    xt = _pallas_irfft_packed(  # custom_vjp wrapper: keeps grad working
        jnp.swapaxes(pre, 1, 2).reshape(b * c, half_a),
        jnp.swapaxes(pim, 1, 2).reshape(b * c, half_a),
        a,
        True,
    )
    x = jnp.swapaxes(xt.reshape(b, c, a), 1, 2).reshape(b, n)
    return x.reshape(*batch_shape, n)


def _rfft_pair_planes(x):
    """Batch-paired large-N forward: returns the two half spectra as f32
    planes (za for even rows, zb for odd rows), each (ceil(B/2), N/2+1).

    All reversal/combine math stays on float32 planes — complex64 is
    interleaved in XLA memory, and a complex-typed combine measured 1.4ms
    of pure relayout at N=2^19 (benchmarks/NOTES.md)."""
    n = x.shape[-1]
    m = n // 2
    xf, batch_shape = _flatten_batch(x.astype(jnp.float32))
    b = xf.shape[0]
    if b % 2:
        xf = jnp.pad(xf, ((0, 1), (0, 0)))
    v = xf.reshape(-1, 2, n)
    zre, zim = _cfft_pair(v[:, 0, :], v[:, 1, :], n, FFT_FORWARD, ordered=True)

    def rev(p):  # p[(N-k) % N]
        return jnp.roll(jnp.flip(p, axis=-1), 1, axis=-1)

    zcre = rev(zre)
    zcim = -rev(zim)
    za_re = 0.5 * (zre + zcre)[..., : m + 1]
    za_im = 0.5 * (zim + zcim)[..., : m + 1]
    zb_re = 0.5 * (zim - zcim)[..., : m + 1]
    zb_im = -0.5 * (zre - zcre)[..., : m + 1]
    return za_re, za_im, zb_re, zb_im, b, batch_shape


def _irfft_pair_planes(za_re, za_im, zb_re, zb_im, n):
    """Inverse of :func:`_rfft_pair_planes` (unscaled): rebuild the paired
    complex row Z = A + i*B over all N bins via Hermitian symmetry (planes
    math only), one backward cfft; the output planes ARE the two time rows."""
    # head bins 0..m: A + iB.
    head_re = za_re - zb_im
    head_im = za_im + zb_re
    # tail bins m+1..N-1: Z[k] = conj((A - iB)[N-k]), N-k in [1, m-1].
    g_re = za_re + zb_im
    g_im = zb_re - za_im
    tail_re = jnp.flip(g_re[..., 1:-1], axis=-1)
    tail_im = jnp.flip(g_im[..., 1:-1], axis=-1)
    zre = jnp.concatenate([head_re, tail_re], axis=-1)
    zim = jnp.concatenate([head_im, tail_im], axis=-1)
    xre, xim = _cfft_pair(zre, zim, n, FFT_BACKWARD, ordered=True)
    return jnp.stack([xre, xim], axis=1).reshape(-1, n)


def _irfft_via_half(spec, plan=None):
    bins = spec.shape[-1]
    n = 2 * (bins - 1)
    del plan
    sf, batch_shape = _flatten_batch(spec.astype(jnp.complex64))
    b = sf.shape[0]
    if b % 2:
        sf = jnp.pad(sf, ((0, 1), (0, 0)))
    v = sf.reshape(-1, 2, bins)
    out = _irfft_pair_planes(
        v[:, 0, :].real, v[:, 0, :].imag, v[:, 1, :].real, v[:, 1, :].imag, n
    )[:b]
    return out.reshape(*batch_shape, n).astype(jnp.float32)


def _assemble_canonical(yre, yim):
    """Packed planes -> canonical-type complex64 spectrum with the Nyquist
    bin appended explicitly (works for any bin order: bin 0 is at index 0
    in every layout here, so the DC/Nyquist unpack is order-independent)."""
    nyq = yim[..., :1]
    col = jax.lax.broadcasted_iota(jnp.int32, yim.shape, yim.ndim - 1)
    yim = jnp.where(col == 0, 0.0, yim)
    main = jax.lax.complex(yre, yim)
    last = jax.lax.complex(nyq, jnp.zeros_like(nyq))
    return jnp.concatenate([main, last], axis=-1)


def _disassemble_canonical(spec):
    spec = spec.astype(jnp.complex64)
    yre = spec[..., :-1].real
    yim = spec[..., :-1].imag
    nyq = spec[..., -1:].real
    col = jax.lax.broadcasted_iota(jnp.int32, yim.shape, yim.ndim - 1)
    yim = jnp.where(col == 0, nyq, yim)
    return yre, yim


def rfft(x, plan=None):
    """Real FFT -> canonical (..., N//2+1) complex64 spectrum.

    Compatibility wrapper over the packed fast path: the complex64 assembly
    (re/im interleave + Nyquist unpack) costs one extra XLA pass — callers
    on the hot path should use :func:`rfft_packed`."""
    yre, yim = rfft_packed(x, plan)
    return _assemble_canonical(yre, yim)


def irfft(spec, plan=None):
    """Unscaled inverse real FFT from a canonical complex spectrum."""
    yre, yim = _disassemble_canonical(spec)
    return irfft_packed(yre, yim)


def rfft_canonical_unordered(x, plan=None):
    """Canonical-type complex64 spectrum in the ENGINE's bin order: the
    first N/2 entries are the packed bins in the kernel's digit-transposed
    layout (bin k1 + N1*k2 at position k1*64 + k2), the appended last entry
    is the Nyquist bin. Pairs with :func:`irfft_canonical_unordered` and
    plain elementwise convolve_accumulate — the fft_transform_unordered
    capability (/root/reference/chowdsp_fft.h:140-145). Skips the ordered
    flatten inside the kernel (for sizes the fused kernel serves); the
    small-N and composite paths' unordered layout is the ordered one, a
    per-plan layout choice exactly as in the reference (SSE vs AVX internal
    layouts differ too)."""
    yre, yim = rfft_packed(x, plan, ordered=False)
    return _assemble_canonical(yre, yim)


def irfft_canonical_unordered(spec, plan=None):
    """Unscaled inverse consuming :func:`rfft_canonical_unordered` order."""
    yre, yim = _disassemble_canonical(spec)
    return irfft_packed(yre, yim, plan, ordered=False)


def _rfft_packed_unordered(x, plan=None):
    return rfft_packed(x, plan, ordered=False)


def _irfft_packed_unordered(yre, yim, plan=None):
    return irfft_packed(yre, yim, plan, ordered=False)


_api.register_engine(
    "pallas",
    {
        "cfft": cfft,
        "rfft": rfft,
        "irfft": irfft,
        "cfft_unordered": cfft_unordered,
        "rfft_unordered": rfft_canonical_unordered,
        "irfft_unordered": irfft_canonical_unordered,
        "rfft_packed": rfft_packed,
        "irfft_packed": irfft_packed,
        "rfft_packed_unordered": _rfft_packed_unordered,
        "irfft_packed_unordered": _irfft_packed_unordered,
        "cfft_planes": cfft_planes,
        "cfft_planes_unordered": functools.partial(cfft_planes, ordered=False),
        "convolve_irfft_packed": convolve_irfft_packed,
    },
    supports=supports_plan,
    prefers=prefer_plan,
)
