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

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..plans import FFT_BACKWARD, FFT_COMPLEX, FFT_FORWARD, FFT_REAL, FFTPlan, cached_plan
from .. import api as _api

__all__ = ["cfft", "rfft", "irfft", "supports_plan", "LANES"]

LANES = 128  # TPU vector lane count == the merge radix
_MIN_N = 2 * LANES  # smallest N with a nontrivial sublane FFT
_MAX_N = 32768  # VMEM budget bound for a single-block transform

# VMEM working set per grid step scales as batch_tile * N; keep
# batch_tile * N under this so in/out double-buffered planes + butterfly
# temporaries fit the per-kernel VMEM budget (v5e OOMs at ~16MB scoped by
# default; we raise the cap but stay conservative for pipelining).
_TILE_ELEMS = 1 << 17
_VMEM_LIMIT = 100 * (1 << 20)


def _batch_tile(n: int, b: int) -> int:
    tb = max(8, min(64, _TILE_ELEMS // n))
    tb = (tb // 8) * 8
    return tb


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def supports_plan(plan: FFTPlan) -> bool:
    if jax.dtypes.canonicalize_dtype(jnp.float32) != jnp.float32:
        return False
    n = plan.cfft_n
    return _is_pow2(n) and _MIN_N <= n <= _MAX_N


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (the CI/test path — the
    analog of the reference exercising its SSE fallback on non-AVX CPUs,
    /root/reference/test/test.cpp:287-304)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Table construction (float64 -> float32, cached per (N, direction))
# ---------------------------------------------------------------------------


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

    # Stage twiddles for the N1 Stockham (radix 4 then 2).
    radices = []
    m = n1
    while m % 4 == 0:
        radices.append(4)
        m //= 4
    if m % 2 == 0:
        radices.append(2)
        m //= 2
    assert m == 1, f"N1={n1} must be a power of two"

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


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------


def _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd: bool):
    """Stockham FFT along axis 0 of (N1, TB, 128) value pairs.

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
        xi = vim.reshape(r, m * s, tb, lanes)
        pr = [xr[k] for k in range(r)]
        pi = [xi[k] for k in range(r)]
        if r == 2:
            zr = [pr[0] + pr[1], pr[0] - pr[1]]
            zi = [pi[0] + pi[1], pi[0] - pi[1]]
        else:  # r == 4; t3 = -i*(b-d) fwd, +i*(b-d) bwd
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
        # Interleave the r butterfly outputs back into (N1,) row order
        # (out row = p*(r*s) + j*s + q), then apply the stage twiddle as an
        # elementwise complex multiply broadcast over (TB, 128) tiles.
        zr = [z.reshape(m, s, tb, lanes) for z in zr]
        zi = [z.reshape(m, s, tb, lanes) for z in zi]
        ar = jnp.stack(zr, axis=1).reshape(n1, tb, lanes)
        ai = jnp.stack(zi, axis=1).reshape(n1, tb, lanes)
        wr = stw_re[t][:, None, :]  # (N1, 1, 128), broadcast over TB
        wi = stw_im[t][:, None, :]
        vre = ar * wr - ai * wi
        vim = ar * wi + ai * wr
        n, s = m, r * s
    return vre, vim


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
):
    """One batch tile: forward pipeline (Stockham -> twiddle -> MXU merge)
    or, with reverse_order=True, the mirrored inverse pipeline
    (MXU merge -> twiddle -> Stockham), which consumes the unordered
    (k1, k2) layout and emits natural time order."""
    tb = xre_ref.shape[0]
    # (TB, N) -> (N1, TB, 128): the batch-minor orientation keeps every
    # Stockham move at whole-vreg granularity; the two swapaxes cost ~24us
    # total at B=1024/N=4096 on v5e, vs ~220us saved in the stages.
    vre = jnp.swapaxes(xre_ref[...].reshape(tb, n1, LANES), 0, 1)
    vim = jnp.swapaxes(xim_ref[...].reshape(tb, n1, LANES), 0, 1)

    stw_re = stw_re_ref[...]
    stw_im = stw_im_ref[...]
    mtw_re = mtw_re_ref[...][:, None, :]  # (N1, 1, 128)
    mtw_im = mtw_im_ref[...][:, None, :]

    def merge_matmul(ar, ai):
        """(N1*TB, 128) x (128, 128) DFT along lanes, on the MXU.
        Complex product via 3 real matmuls (Karatsuba) in fp32 HIGHEST
        precision — measured ~30% faster than the 4-matmul form at equal
        accuracy (err ~7e-6 at N=4096, bound 8.2e-4)."""
        a2r = ar.reshape(n1 * tb, LANES)
        a2i = ai.reshape(n1 * tb, LANES)
        mr = dft_re_ref[...]
        mi = dft_im_ref[...]
        dot = functools.partial(
            jnp.dot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        p1 = dot(a2r, mr)
        p2 = dot(a2i, mi)
        p3 = dot(a2r + a2i, mr + mi)
        yr = p1 - p2
        yi = p3 - p1 - p2
        return yr.reshape(n1, tb, LANES), yi.reshape(n1, tb, LANES)

    def twiddle(ar, ai):
        return ar * mtw_re - ai * mtw_im, ar * mtw_im + ai * mtw_re

    if not reverse_order:
        vre, vim = _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd)
        vre, vim = twiddle(vre, vim)
        vre, vim = merge_matmul(vre, vim)
    else:
        vre, vim = merge_matmul(vre, vim)
        vre, vim = twiddle(vre, vim)
        vre, vim = _stockham_rows(vre, vim, radices, stw_re, stw_im, sign_fwd)

    yre_ref[...] = jnp.swapaxes(vre, 0, 1).reshape(tb, n1 * LANES)
    yim_ref[...] = jnp.swapaxes(vim, 0, 1).reshape(tb, n1 * LANES)


def _pallas_cfft_pair(
    xre: jax.Array,
    xim: jax.Array,
    n: int,
    forward: bool,
    reverse_order: bool,
) -> tuple[jax.Array, jax.Array]:
    """Run the kernel over (B, N) float32 planes. Batch is padded to the
    tile size; tables ride along as replicated inputs."""
    n1 = n // LANES
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(xre, xim, stw_re, stw_im, mtw_re, mtw_im, dft_re, dft_im)

    if pad:
        yre, yim = yre[:b], yim[:b]
    return yre, yim


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


def _cfft_pair(xre, xim, n, direction, ordered):
    forward = direction == FFT_FORWARD
    if forward:
        yre, yim = _pallas_cfft_pair(xre, xim, n, forward=True, reverse_order=False)
        if ordered:
            yre = _digit_transpose(yre, n, inverse=False)
            yim = _digit_transpose(yim, n, inverse=False)
        return yre, yim
    # Backward: bring input into (k1, k2) layout if it is in natural order,
    # then run the mirrored pipeline (emits natural time order directly).
    if ordered:
        xre = _digit_transpose(xre, n, inverse=True)
        xim = _digit_transpose(xim, n, inverse=True)
    return _pallas_cfft_pair(xre, xim, n, forward=False, reverse_order=True)


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


def cfft_unordered(x, plan=None, direction=FFT_FORWARD):
    """Complex FFT in this engine's internal (digit-transposed) order."""
    n = x.shape[-1]
    plan = plan or cached_plan(n, FFT_COMPLEX)
    return _cfft_complex(x, plan, direction, ordered=False)


def rfft(x, plan=None):
    """Real FFT: pack -> pallas half-length cfft -> split. The pack/split
    stay at the JAX level (pure elementwise + flip; XLA fuses them around
    the kernel)."""
    n = x.shape[-1]
    plan = plan or cached_plan(n, FFT_REAL)
    m = n // 2
    x = x.astype(jnp.float32)
    xf, batch_shape = _flatten_batch(x)
    v = xf.reshape(-1, m, 2)
    zre, zim = v[..., 0], v[..., 1]
    Zre, Zim = _cfft_pair(zre, zim, m, FFT_FORWARD, ordered=True)
    Z = jax.lax.complex(Zre, Zim)
    Zc = jnp.conj(jnp.roll(jnp.flip(Z, axis=-1), 1, axis=-1))
    E = 0.5 * (Z + Zc)
    O = -0.5j * (Z - Zc)
    w = jax.lax.complex(plan.rfft_tw_re, plan.rfft_tw_im)
    main = E + w * O
    nyq = (E[..., :1] - O[..., :1]).real
    out = jnp.concatenate([main, jax.lax.complex(nyq, jnp.zeros_like(nyq))], axis=-1)
    return out.reshape(*batch_shape, m + 1)


def irfft(spec, plan=None):
    """Unscaled inverse real FFT: split -> pallas backward cfft -> unpack."""
    bins = spec.shape[-1]
    n = 2 * (bins - 1)
    plan = plan or cached_plan(n, FFT_REAL)
    m = n // 2
    spec = spec.astype(jnp.complex64)
    sf, batch_shape = _flatten_batch(spec)
    Xmain = sf[..., :m]
    Xr = jnp.conj(jnp.flip(sf[..., 1:], axis=-1))
    E = 0.5 * (Xmain + Xr)
    wb = jax.lax.complex(plan.rfft_tw_re, -plan.rfft_tw_im)
    O = 0.5 * wb * (Xmain - Xr)
    Z = E + 1j * O
    zre, zim = _cfft_pair(Z.real, Z.imag, m, FFT_BACKWARD, ordered=True)
    out = jnp.stack([2.0 * zre, 2.0 * zim], axis=-1).reshape(-1, n)
    return out.reshape(*batch_shape, n).astype(jnp.float32)


# Real-transform unordered variants: this engine chooses its real-spectrum
# internal order == canonical order (a legal layout choice — the contract
# only requires unordered-forward -> convolve -> unordered-backward to
# compose, /root/reference/chowdsp_fft.h:140-154). The complex unordered
# path carries the actual digit-transposed fast layout.
_api.register_engine(
    "pallas",
    {
        "cfft": cfft,
        "rfft": rfft,
        "irfft": irfft,
        "cfft_unordered": cfft_unordered,
        "rfft_unordered": rfft,
        "irfft_unordered": irfft,
    },
    supports=supports_plan,
)
