"""Verify drive: irfft_packed Mosaic fix + public API flows on real TPU."""
import numpy as np
import jax
import jax.numpy as jnp

import chowdsp_fft_tpu as cf

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(7)

# 1. rfft/irfft packed roundtrip (the fixed path), several sizes.
for n in (128, 1024, 4096, 8192, 32768):
    b = 32
    x = rng.standard_normal((b, n)).astype(np.float32)
    xd = jax.device_put(x)

    @jax.jit
    def rt(v):
        re, im = cf.rfft_packed(v)
        return cf.irfft_packed(re, im)

    back = np.asarray(rt(xd)) / n
    err = np.abs(back - x).max()
    print(f"  rfft->irfft N={n}: err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
    assert err < 2e-7 * n

# 2. forward vs numpy f64 (canonical complex API, planes out).
n, b = 4096, 16
x = rng.standard_normal((b, n)).astype(np.float32)

@jax.jit
def fwd_planes(v):
    s = cf.rfft(v)
    return s.real, s.imag

sr, si = fwd_planes(jax.device_put(x))
got = np.asarray(sr) + 1j * np.asarray(si)
ref = np.fft.rfft(x.astype(np.float64), axis=-1)
err = np.abs(got - ref).max()
print(f"  rfft vs numpy f64 N={n}: err {err:.2e} (bound {2e-7*n:.1e})", flush=True)
assert err < 2e-7 * n

# 3. complex fft/ifft unscaled semantics.
zr = rng.standard_normal((b, n)).astype(np.float32)
zi = rng.standard_normal((b, n)).astype(np.float32)

@jax.jit
def crt(r, i):
    fr, fi = cf.fft_planes(r, i)
    return cf.ifft_planes(fr, fi)

br, bi = crt(jax.device_put(zr), jax.device_put(zi))
err = max(np.abs(np.asarray(br) / n - zr).max(), np.abs(np.asarray(bi) / n - zi).max())
print(f"  cfft roundtrip N={n}: err {err:.2e}", flush=True)
assert err < 2e-7 * n

# 3b. ordered cfft at n1=64 (the round-5 in-kernel ordered gate edge,
# _ORDERED_IN_KERNEL_MAX_N1=64) AND n1=128 (external digit-transpose
# path), forward vs numpy f64. Own error variable — a round-4-class bug
# rebound section 3's `err` here and silently skipped its assert.
for n_ord in (8192, 16384):
    zo_r = rng.standard_normal((8, n_ord)).astype(np.float32)
    zo_i = rng.standard_normal((8, n_ord)).astype(np.float32)
    fr, fi = jax.jit(cf.fft_planes)(jax.device_put(zo_r), jax.device_put(zo_i))
    ref_c = np.fft.fft(zo_r.astype(np.float64) + 1j * zo_i.astype(np.float64), axis=-1)
    err_ord = max(np.abs(np.asarray(fr) - ref_c.real).max(),
                  np.abs(np.asarray(fi) - ref_c.imag).max())
    print(f"  ordered cfft N={n_ord} (n1={n_ord//128}): err {err_ord:.2e} "
          f"(bound {2e-7*n_ord:.1e})", flush=True)
    assert err_ord < 2e-7 * n_ord

# 4. fast-convolution via the unordered path (contractual composition).
h = (rng.standard_normal((1, n)) / 64).astype(np.float32)

@jax.jit
def conv(v, k):
    vs = cf.rfft_unordered(v)
    ks = cf.rfft_unordered(k)
    return cf.irfft_unordered(cf.convolve_accumulate(vs, ks))

y = np.asarray(conv(jax.device_put(x), jax.device_put(h))) / n
ref_y = np.fft.irfft(
    np.fft.rfft(x.astype(np.float64), axis=-1) * np.fft.rfft(h.astype(np.float64), axis=-1),
    axis=-1,
)
err = np.abs(y - ref_y).max()
print(f"  unordered convolve N={n}: err {err:.2e}", flush=True)
assert err < 2e-6 * n

# 5. error paths.
try:
    cf.make_plan(7)
    raise SystemExit("make_plan(7) did not raise")
except cf.InvalidSizeError:
    print("  make_plan(7) -> InvalidSizeError ok", flush=True)
try:
    cf.rfft(jnp.zeros((2, 64)), engine="bogus")
    raise SystemExit("engine=bogus did not raise")
except ValueError:
    print("  engine='bogus' -> ValueError ok", flush=True)

print("VERIFY_OK", flush=True)
