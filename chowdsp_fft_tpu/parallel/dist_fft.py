"""Distributed FFT: one transform sharded across a device mesh.

The reference never leaves a single core; this is the multi-chip
capability its decomposition was always pointing at (SURVEY.md §2 row 9:
blockwise decomposition + boundary merge). The composite four-step
factorization N = A * C maps onto a mesh holding the signal
time-contiguously (rows j of the row-major (A, C) view, n = j*C + k):

    X[q + A*t] = sum_k W_C^{±tk} * W_N^{±kq} * [ sum_j x[j*C+k] W_A^{±qj} ]

    step 1  all_to_all transpose: each device gets C/D full columns   (ICI)
    step 2  length-A FFTs along the now-local j axis          (local kernel)
    step 3  twiddle W_N^{±kq}                             (local, table slab)
    step 4  all_to_all transpose back                                 (ICI)
    step 5  length-C FFTs along the local k axis              (local kernel)

Each all_to_all moves every element once (N/D per device) — the standard
block-distributed 1-D FFT communication pattern.

The result is returned in the transform's **distributed bin order**: the
device owning output block f holds X[(f*A/D + q_loc) + A*t] at local
position q_loc*C + t. Like the single-chip engines' "unordered" layouts
(the `fft_transform_unordered` capability, /root/reference/chowdsp_fft.h:
140-145), this order is engine-private: frequency-domain elementwise work
(convolution!) is order-independent, and :func:`sharded_ifft_planes`
consumes it directly, returning natural time order. `spectrum_order`
exposes the bin permutation for tests and spectral post-processing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pallas_fft as _pf
from ..plans import FFT_FORWARD, FFT_BACKWARD
from .mesh import TIME_AXIS

__all__ = [
    "sharded_fft_planes",
    "sharded_ifft_planes",
    "sharded_fft_convolve",
    "spectrum_order",
]

_MIN_FACTOR = 256  # engine-supported row length for the local FFTs


def _dist_split(n: int, n_dev: int) -> tuple[int, int]:
    """n = A * C, both pow2 factors >= _MIN_FACTOR and divisible by n_dev."""
    lg = n.bit_length() - 1
    a = 1 << ((lg + 1) // 2)
    c = n // a
    ok = (
        lambda a_, c_: a_ % n_dev == 0
        and c_ % n_dev == 0
        and min(a_, c_) >= _MIN_FACTOR
        and max(a_, c_) <= _pf._MAX_N
    )
    # nudge the split if divisibility fails
    for shift in range(0, lg):
        for a_try in (a << shift, a >> shift):
            if a_try and n % a_try == 0 and ok(a_try, n // a_try):
                return a_try, n // a_try
    raise ValueError(
        f"cannot shard N={n} over {n_dev} devices "
        f"(need pow2 A*C with A,C >= {_MIN_FACTOR}, both divisible by {n_dev})"
    )


def _engine_perm(length: int) -> np.ndarray:
    """The single-chip engine's unordered bin permutation for a local FFT
    of this length (identity when the portable engine would be picked)."""
    from ..plans import FFT_COMPLEX, cached_plan

    if _pf.supports_plan(cached_plan(length, FFT_COMPLEX)):
        return _pf._kernel_perm(length)
    return np.arange(length, dtype=np.int64)


@functools.lru_cache(maxsize=16)
def _dist_twiddle(n: int, a: int, forward: bool):
    """(C, A) table W_N^(sgn * k * perm_A(q)) — rows k (sharded at apply
    time). The local level-1 FFTs run in the engine's UNORDERED layout
    (no reorder pass); its bin permutation is folded into the twiddle
    columns here and into :func:`spectrum_order`."""
    c = n // a
    sgn = -1.0 if forward else 1.0
    k = np.arange(c, dtype=np.float64)[:, None]
    q = _engine_perm(a).astype(np.float64)[None, :]
    ang = sgn * 2.0 * np.pi * (k * q) / float(n)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def spectrum_order(n: int, n_dev: int) -> np.ndarray:
    """perm with perm[p] = the bin stored at flat position p of the
    distributed spectrum: p = q_row*C + t_col -> bin
    perm_A(q_row) + A * perm_C(t_col) (both engine permutations folded)."""
    a, c = _dist_split(n, n_dev)
    pa = _engine_perm(a)
    pc = _engine_perm(c)
    p = np.arange(n, dtype=np.int64)
    return pa[p // c] + a * pc[p % c]


def _a2a_transpose(v, axis_name, n_dev):
    """Distributed matrix transpose inside shard_map.

    Local view (rows_loc, cols) of a row-sharded global (R, cols) matrix
    -> local (cols/D, R) rows of the transposed matrix: split the columns
    into D contiguous groups, all_to_all swaps the group index with the
    device axis (each element moves once over ICI), then one local 2D
    transpose."""
    r_loc, cols_total = v.shape
    g = v.reshape(r_loc, n_dev, cols_total // n_dev)
    g = jax.lax.all_to_all(g, axis_name, split_axis=1, concat_axis=0, tiled=True)
    # g: (D*r_loc, cols/D) = all global rows x this device's column group.
    return g.reshape(n_dev * r_loc, cols_total // n_dev).swapaxes(0, 1)


def sharded_fft_planes(
    re: jax.Array,
    im: jax.Array,
    mesh: Mesh,
    axis_name: str = TIME_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """One length-N forward complex FFT distributed over the mesh.

    ``re``/``im``: (N,) float32 planes, time-contiguous over ``axis_name``.
    Returns (N,) spectrum planes in the distributed bin order
    (:func:`spectrum_order`), sharded over the same axis. Unscaled.
    """
    n = re.shape[-1]
    n_dev = mesh.shape[axis_name]
    a, c = _dist_split(n, n_dev)
    twr_h, twi_h = _dist_twiddle(n, a, True)
    rows_loc = a // n_dev

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name, None), P(axis_name, None)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    def run(re_loc, im_loc, twr, twi):
        xr = re_loc.reshape(rows_loc, c)
        xi = im_loc.reshape(rows_loc, c)
        # step 1: (A, C) -> each device holds C/D columns as rows (C/D, A)
        gr = _a2a_transpose(xr, axis_name, n_dev)
        gi = _a2a_transpose(xi, axis_name, n_dev)
        # step 2: length-A FFTs along the local j axis, engine-unordered
        # (the bin permutation is folded into the twiddle + spectrum_order)
        fr, fi = _pf._cfft_pair(gr, gi, a, FFT_FORWARD, False)
        # step 3: twiddle W_N^{-kq}; twr arrives as this device's (C/D, A) slab
        fr, fi = fr * twr - fi * twi, fr * twi + fi * twr
        # step 4: transpose back -> (A/D, C) rows q_loc
        hr = _a2a_transpose(fr, axis_name, n_dev)
        hi = _a2a_transpose(fi, axis_name, n_dev)
        # step 5: length-C FFTs along the local k axis, engine-unordered:
        # position [q_row, t_col] holds X[perm_A(q_row) + A*perm_C(t_col)]
        yr, yi = _pf._cfft_pair(hr, hi, c, FFT_FORWARD, False)
        return yr.reshape(-1), yi.reshape(-1)

    return run(re, im, jnp.asarray(twr_h), jnp.asarray(twi_h))


def sharded_ifft_planes(
    re: jax.Array,
    im: jax.Array,
    mesh: Mesh,
    axis_name: str = TIME_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """Unscaled inverse consuming the distributed bin order of
    :func:`sharded_fft_planes`; returns time-contiguous (N,) planes
    (ifft(fft(x)) == N * x)."""
    n = re.shape[-1]
    n_dev = mesh.shape[axis_name]
    a, c = _dist_split(n, n_dev)
    twr_h, twi_h = _dist_twiddle(n, a, False)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name, None), P(axis_name, None)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    def run(re_loc, im_loc, twr, twi):
        yr = re_loc.reshape(a // n_dev, c)
        yi = im_loc.reshape(a // n_dev, c)
        # mirror of the forward: the reverse pipelines natively consume
        # the engine-unordered layouts the forward emitted
        hr, hi = _pf._cfft_pair(yr, yi, c, FFT_BACKWARD, False)
        fr = _a2a_transpose(hr, axis_name, n_dev)
        fi = _a2a_transpose(hi, axis_name, n_dev)
        fr, fi = fr * twr - fi * twi, fr * twi + fi * twr
        gr, gi = _pf._cfft_pair(fr, fi, a, FFT_BACKWARD, False)
        xr = _a2a_transpose(gr, axis_name, n_dev)
        xi = _a2a_transpose(gi, axis_name, n_dev)
        return xr.reshape(-1), xi.reshape(-1)

    return run(re, im, jnp.asarray(twr_h), jnp.asarray(twi_h))


def sharded_fft_convolve(
    x_re: jax.Array,
    x_im: jax.Array,
    h_re: jax.Array,
    h_im: jax.Array,
    mesh: Mesh,
    axis_name: str = TIME_AXIS,
    scaling: float | jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Circular convolution of two length-N complex signals, everything
    distributed: two sharded forward FFTs, an elementwise spectral product
    (order-independent, so the distributed bin order never matters — the
    multi-chip rendition of the reference's unordered convolve pipeline,
    /root/reference/test/test.cpp:131-232), one sharded inverse.

    ``scaling`` defaults to 1/N, returning the true circular convolution.
    """
    n = x_re.shape[-1]
    s = (1.0 / n) if scaling is None else scaling
    ar, ai = sharded_fft_planes(x_re, x_im, mesh, axis_name)
    br, bi = sharded_fft_planes(h_re, h_im, mesh, axis_name)
    pr = (ar * br - ai * bi) * s
    pi = (ar * bi + ai * br) * s
    return sharded_ifft_planes(pr, pi, mesh, axis_name)
