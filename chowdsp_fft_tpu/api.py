"""Public API: plans, transforms, and convolution helpers.

Functional JAX re-design of the reference's 10-function C API
(/root/reference/chowdsp_fft.h:63-163). Mapping:

  fft_new_setup / _preallocated / destroy  -> make_plan (plans are pytrees;
                                              no destroy, no placement)
  fft_bytes_required                       -> plan_bytes (informational)
  fft_simd_width_bytes                     -> vector_width_bytes (VPU lanes)
  fft_transform                            -> fft / ifft / rfft / irfft
  fft_transform_unordered                  -> *_unordered variants
  fft_convolve_unordered                   -> convolve_accumulate
  fft_accumulate                           -> accumulate
  aligned_malloc / aligned_free            -> N/A (XLA owns buffers)

Semantics preserved from the reference:
- Unscaled transforms: ifft(fft(x)) == N * x (/root/reference/chowdsp_fft.h:128).
- Unordered transforms pair with convolve_accumulate for order-independent
  frequency-domain work (/root/reference/chowdsp_fft.h:140-154). Which
  permutation "unordered" means is engine-private, exactly as in the
  reference where it is backend-private (SSE vs AVX internal layouts
  differ); this module guarantees only that unordered-forward ->
  convolve -> unordered-backward round-trips.

In-place capability (the reference documents "input and output may alias",
/root/reference/chowdsp_fft.h:136, and its own bench transforms in place):
the complex metal kernels declare ``input_output_aliases``, so under
``jax.jit`` XLA lands the output planes on the input pages WHENEVER the
input value is dead after the call — the functional-JAX form of in-place.
Callers opt in simply by not reusing the input (chains, scan carries,
donated jit arguments via ``jax.jit(f, donate_argnums=...)``); callers that
keep the input alive still get value semantics, at the cost of a defensive
copy XLA inserts (measured +25% on the mid-band complex kernel vs the 30%
in-place win — benchmarks/NOTES.md round 5). Real-transform kernels have
asymmetric in/out shapes and never alias; their IO footprint already sits
in the fast HBM window.

Engine dispatch (the TPU analog of the reference's AVX-vs-SSE runtime
dispatch via pointer tagging, /root/reference/chowdsp_fft.cpp:213-280):
``engine="auto"`` picks the Pallas metal engine when the size/backend
supports it and falls back to the jnp Stockham engine otherwise — the same
try-the-fast-backend-else-fall-back shape as fft_new_setup_preallocated
(/root/reference/chowdsp_fft.cpp:258-280), decided at trace time instead of
at setup time.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .plans import (
    FFT_BACKWARD,
    FFT_COMPLEX,
    FFT_FORWARD,
    FFT_REAL,
    FFTPlan,
    InvalidSizeError,
    cached_plan,
    factorize,
    is_valid_size,
    make_plan,
)
from .ops import stockham
from .ops.convolve import (
    accumulate,
    convolve_accumulate,
    convolve_accumulate_packed,
    multiply_spectra,
)
from .ops.layout import packed_planes_to_spectrum, spectrum_to_packed_planes

__all__ = [
    "FFT_FORWARD",
    "FFT_BACKWARD",
    "FFT_REAL",
    "FFT_COMPLEX",
    "FFTPlan",
    "InvalidSizeError",
    "make_plan",
    "cached_plan",
    "factorize",
    "is_valid_size",
    "plan_bytes",
    "vector_width_bytes",
    "available_engines",
    "engine_for",
    "engine_supports",
    "fft",
    "ifft",
    "rfft",
    "irfft",
    "fft_unordered",
    "ifft_unordered",
    "rfft_unordered",
    "irfft_unordered",
    "rfft_packed",
    "irfft_packed",
    "rfft_packed_unordered",
    "irfft_packed_unordered",
    "fft_planes",
    "ifft_planes",
    "fft_planes_unordered",
    "ifft_planes_unordered",
    "convolve_accumulate",
    "convolve_accumulate_packed",
    "convolve_irfft_packed",
    "multiply_spectra",
    "accumulate",
    "spectrum_to_packed_planes",
    "packed_planes_to_spectrum",
]

# ---------------------------------------------------------------------------
# Engine registry. The Pallas engine registers itself on import (see
# ops/pallas_fft.py); the Stockham jnp engine is always available.
# ---------------------------------------------------------------------------

_ENGINES: dict[str, dict[str, Callable]] = {}


def register_engine(
    name: str,
    fns: dict[str, Callable],
    supports: Callable[[FFTPlan], bool],
    prefers: Callable[[FFTPlan], bool] | None = None,
):
    """``supports`` gates what the engine can serve (explicit ``engine=``
    requests); ``prefers`` (default: same as ``supports``) gates what
    ``engine="auto"`` hands it — engines drop plans they can run but are
    measured slower on, and auto falls through to the next engine."""
    _ENGINES[name] = {
        "fns": fns,
        "supports": supports,
        "prefers": supports if prefers is None else prefers,
    }


def _stockham_rfft_packed(x, plan=None):
    return spectrum_to_packed_planes(stockham.rfft(x, plan))


def _stockham_irfft_packed(re, im, plan=None):
    return stockham.irfft(packed_planes_to_spectrum(re, im), plan)


def _stockham_cfft_planes(re, im, plan=None, direction=FFT_FORWARD):
    z = stockham.cfft(jax.lax.complex(re, im), plan, direction)
    return z.real, z.imag


register_engine(
    "stockham",
    {
        "cfft": stockham.cfft,
        "rfft": stockham.rfft,
        "irfft": stockham.irfft,
        # Stockham output is naturally ordered; its "unordered" layout is
        # simply the ordered one (a legal choice of internal layout).
        "cfft_unordered": stockham.cfft,
        "rfft_unordered": stockham.rfft,
        "irfft_unordered": stockham.irfft,
        "rfft_packed": _stockham_rfft_packed,
        "irfft_packed": _stockham_irfft_packed,
        "rfft_packed_unordered": _stockham_rfft_packed,
        "irfft_packed_unordered": _stockham_irfft_packed,
        "cfft_planes": _stockham_cfft_planes,
        "cfft_planes_unordered": _stockham_cfft_planes,
    },
    supports=lambda plan: True,
)


def _pick_engine(plan: FFTPlan, engine: str) -> dict[str, Callable]:
    if engine != "auto":
        e = _ENGINES.get(engine)
        if e is None:
            raise ValueError(f"unknown engine {engine!r}; have {sorted(_ENGINES)}")
        if not e["supports"](plan):
            raise ValueError(f"engine {engine!r} does not support plan (N={plan.n}, kind={plan.kind})")
        return e["fns"]
    # auto: prefer the metal engine, fall back to stockham — mirrors the
    # reference's AVX-then-SSE fallback (/root/reference/chowdsp_fft.cpp:258-280).
    for name in ("pallas", "stockham"):
        e = _ENGINES.get(name)
        if e is not None and e["prefers"](plan):
            return e["fns"]
    raise AssertionError("stockham engine should always be available")


# ---------------------------------------------------------------------------
# Informational queries
# ---------------------------------------------------------------------------


def available_engines() -> tuple[str, ...]:
    """Registered engine names, fastest first — the introspection analog of
    the reference's CPU capability probe (`cpu_supports_avx`,
    /root/reference/chowdsp_fft.cpp:107-211): it reports what the dispatch
    layer can actually use on this process's backend."""
    names = [n for n in ("pallas", "stockham") if n in _ENGINES]
    names += [n for n in _ENGINES if n not in names]
    return tuple(names)


def engine_for(n: int, kind: str = FFT_COMPLEX) -> str:
    """Which engine ``engine="auto"`` would select for this transform —
    the analog of inspecting the reference's setup pointer tag
    (/root/reference/chowdsp_fft.cpp:213-229)."""
    plan = cached_plan(n, kind)
    for name in ("pallas", "stockham"):
        e = _ENGINES.get(name)
        if e is not None and e["prefers"](plan):
            return name
    raise AssertionError("stockham engine should always be available")


def engine_supports(name: str, n: int, kind: str = FFT_COMPLEX) -> bool:
    """Whether an explicit ``engine=name`` request can serve this transform
    (a superset of what ``engine_for`` auto-selects: an engine may support a
    plan it is measured slower on and therefore doesn't prefer)."""
    e = _ENGINES.get(name)
    if e is None:
        raise ValueError(f"unknown engine {name!r}; have {sorted(_ENGINES)}")
    return bool(e["supports"](cached_plan(n, kind)))


def plan_bytes(n: int, kind: str = FFT_COMPLEX) -> int:
    """Bytes of twiddle-table storage a plan carries. Informational analog of
    ``fft_bytes_required`` (/root/reference/chowdsp_fft.h:81-85) — here the
    runtime owns placement, so this is for capacity planning only."""
    plan = cached_plan(n, kind)
    total = 0
    for st in plan.stages:
        total += st.tw_re.size * 4 + st.tw_im.size * 4
    if plan.rfft_tw_re is not None:
        total += plan.rfft_tw_re.size * 4 + plan.rfft_tw_im.size * 4
    return total


def vector_width_bytes() -> int:
    """TPU VPU lane width in bytes (128 fp32 lanes), the analog of
    ``fft_simd_width_bytes`` (/root/reference/chowdsp_fft.h:121-122, 16 for
    SSE/NEON, 32 for AVX)."""
    return 128 * 4


# ---------------------------------------------------------------------------
# Transforms (unscaled: ifft(fft(x)) == N * x)
# ---------------------------------------------------------------------------


def fft(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Ordered forward complex FFT over the last axis -> (..., N) complex64."""
    plan = plan or cached_plan(x.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft"](x, plan, FFT_FORWARD)


def ifft(spec: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Ordered backward complex FFT (unscaled: returns N * inverse)."""
    plan = plan or cached_plan(spec.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft"](spec, plan, FFT_BACKWARD)


def rfft(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Real forward FFT -> canonical (..., N//2+1) complex spectrum."""
    plan = plan or cached_plan(x.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["rfft"](x, plan)


def irfft(spec: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Backward real FFT (unscaled): irfft(rfft(x)) == N * x -> (..., N) f32."""
    n = 2 * (spec.shape[-1] - 1)
    plan = plan or cached_plan(n, FFT_REAL)
    return _pick_engine(plan, engine)["irfft"](spec, plan)


def fft_unordered(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Forward complex FFT in engine-internal frequency order
    (capability of ``fft_transform_unordered``, /root/reference/chowdsp_fft.h:140-145)."""
    plan = plan or cached_plan(x.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft_unordered"](x, plan, FFT_FORWARD)


def ifft_unordered(spec: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    """Backward complex FFT consuming engine-internal frequency order."""
    plan = plan or cached_plan(spec.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft_unordered"](spec, plan, FFT_BACKWARD)


def rfft_unordered(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    plan = plan or cached_plan(x.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["rfft_unordered"](x, plan)


def fft_planes(
    re: jax.Array,
    im: jax.Array,
    plan: FFTPlan | None = None,
    engine: str = "auto",
    direction: str = FFT_FORWARD,
):
    """Complex FFT on SoA float32 planes -> (re, im) planes (ordered).

    The planes interface skips the complex64 interleave relayouts the
    complex wrappers pay around the kernels — the complex analog of
    :func:`rfft_packed`. Unscaled both directions."""
    plan = plan or cached_plan(re.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft_planes"](re, im, plan, direction)


def ifft_planes(re, im, plan=None, engine: str = "auto"):
    return fft_planes(re, im, plan, engine, direction=FFT_BACKWARD)


def fft_planes_unordered(
    re: jax.Array,
    im: jax.Array,
    plan: FFTPlan | None = None,
    engine: str = "auto",
    direction: str = FFT_FORWARD,
):
    """Planes complex FFT in engine-internal frequency order."""
    plan = plan or cached_plan(re.shape[-1], FFT_COMPLEX)
    return _pick_engine(plan, engine)["cfft_planes_unordered"](re, im, plan, direction)


def ifft_planes_unordered(re, im, plan=None, engine: str = "auto"):
    return fft_planes_unordered(re, im, plan, engine, direction=FFT_BACKWARD)


def rfft_packed(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto"):
    """Real FFT -> packed SoA half-spectrum planes ((..., N/2) f32 re, im).

    The framework's fastest real-transform path (one fused kernel on the
    Pallas engine; minimal HBM traffic). Layout: re[k]/im[k] hold bin k for
    k in [1, N/2); re[0] = DC, im[0] = Nyquist — the SoA rendition of
    pffft's packed real spectrum (/root/reference/chowdsp_fft_juce/
    chowdsp_fft_juce.cpp:48-61). Pair with :func:`irfft_packed` and
    :func:`convolve_accumulate_packed`."""
    plan = plan or cached_plan(x.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["rfft_packed"](x, plan)


def irfft_packed(
    re: jax.Array, im: jax.Array, plan: FFTPlan | None = None, engine: str = "auto"
) -> jax.Array:
    """Unscaled inverse of :func:`rfft_packed`: (..., N) f32 == N * x."""
    plan = plan or cached_plan(2 * re.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["irfft_packed"](re, im, plan)


def rfft_packed_unordered(x: jax.Array, plan: FFTPlan | None = None, engine: str = "auto"):
    """Packed real FFT in engine-internal bin order (bin 0 stays at index 0,
    so convolve_accumulate_packed applies unchanged) — the packed analog of
    ``fft_transform_unordered`` (/root/reference/chowdsp_fft.h:140-145)."""
    plan = plan or cached_plan(x.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["rfft_packed_unordered"](x, plan)


def irfft_packed_unordered(
    re: jax.Array, im: jax.Array, plan: FFTPlan | None = None, engine: str = "auto"
) -> jax.Array:
    plan = plan or cached_plan(2 * re.shape[-1], FFT_REAL)
    return _pick_engine(plan, engine)["irfft_packed_unordered"](re, im, plan)


def irfft_unordered(spec: jax.Array, plan: FFTPlan | None = None, engine: str = "auto") -> jax.Array:
    n = 2 * (spec.shape[-1] - 1)
    plan = plan or cached_plan(n, FFT_REAL)
    return _pick_engine(plan, engine)["irfft_unordered"](spec, plan)


def convolve_irfft_packed(
    are: jax.Array,
    aim: jax.Array,
    bre: jax.Array,
    bim: jax.Array,
    scaling: float | jax.Array = 1.0,
    plan: FFTPlan | None = None,
    engine: str = "auto",
    ordered: bool = True,
) -> jax.Array:
    """Fused spectral multiply + unscaled real inverse:
    ``irfft_packed(convolve_accumulate_packed(A, B, scaling=scaling))`` as
    ONE kernel on the Pallas engine — the product spectrum never round-trips
    through HBM, which removes ~2 memory passes from the reference's
    convolve-then-inverse pipeline (/root/reference/chowdsp_fft.h:147-154
    feeding the backward transform). B may be a single shared spectrum (a
    filter) broadcast over A's batch. Engines without the fused kernel run
    the identical unfused composition."""
    plan = plan or cached_plan(2 * are.shape[-1], FFT_REAL)
    eng = _pick_engine(plan, engine)
    fn = eng.get("convolve_irfft_packed")
    if fn is not None:
        return fn(are, aim, bre, bim, scaling=scaling, ordered=ordered)
    pr, pi = convolve_accumulate_packed((are, aim), (bre, bim), scaling=scaling)
    key = "irfft_packed" if ordered else "irfft_packed_unordered"
    return eng[key](pr, pi, plan)
