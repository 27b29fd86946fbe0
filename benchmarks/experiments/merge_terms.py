"""Term-magnitude analysis for the merge matmul's bf16 split schemes.

y = a @ M (K=128). 3-way exact split: a = hi+lo+lo2, M = Mhi+Mlo+Mlo2
(f32 = 3 x 8 mantissa bits, so the 3-way split is exact).
Products by magnitude class:
  T1 hi@Mhi (O(1))      T2 hi@Mlo, T3 lo@Mhi (~2^-8)
  T4 lo@Mlo, T5 lo2@Mhi, T6 hi@Mlo2 (~2^-16)   rest < 2^-24
bf16x3 keeps T1..T3. Question: which of T4/T5/T6 dominates its error,
and does keeping two of them (5 passes) or one (4 passes) meet the
reference bound 2e-7*N?
"""
import numpy as np
import ml_dtypes

def bf16(x):
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)

rng = np.random.default_rng(0)
N = 4096
n1 = N // 128
B = 64

# realistic merge operand: stage outputs of the real kernel ~ partial FFTs
x = rng.standard_normal((B, N)).astype(np.float32)
# emulate: after n1-point FFTs along axis formed by reshape (B, n1, 128)
v = np.fft.fft(x.reshape(B, n1, 128), axis=1)  # (B, n1, 128) complex
a = np.ascontiguousarray(v.real.swapaxes(0, 1).reshape(n1 * B, 128)).astype(np.float32)

k2 = np.arange(128.0)
ang = -2 * np.pi * np.outer(np.arange(128.0), k2) / 128.0
M = np.cos(ang).astype(np.float32)

ahi = bf16(a); alo = bf16(a - ahi); alo2 = (a - ahi - alo)
Mhi = bf16(M); Mlo = bf16(M - Mhi); Mlo2 = (M - Mhi - Mlo)
assert np.abs(a - ahi - alo - alo2).max() == 0.0, "3-way split not exact?"
assert np.abs(M - Mhi - Mlo - Mlo2).max() == 0.0

f64 = np.float64
y_exact = a.astype(f64) @ M.astype(f64)

def d(x32, m32):
    return x32.astype(f64) @ m32.astype(f64)

T = {
    "T1 hi@Mhi": d(ahi, Mhi),
    "T2 hi@Mlo": d(ahi, Mlo),
    "T3 lo@Mhi": d(alo, Mhi),
    "T4 lo@Mlo": d(alo, Mlo),
    "T5 lo2@Mhi": d(alo2, Mhi),
    "T6 hi@Mlo2": d(ahi, Mlo2),
    "T7 lo@Mlo2+lo2@Mlo+lo2@Mlo2": d(alo, Mlo2) + d(alo2, Mlo) + d(alo2, Mlo2),
}
print(f"{'term':<30}{'rms':>12}{'max':>12}")
for k_, t in T.items():
    print(f"{k_:<30}{np.sqrt((t**2).mean()):>12.3e}{np.abs(t).max():>12.3e}")

print("\nscheme errors vs exact f64 (per-matmul, pre-accumulation):")
schemes = {
    "bf16x3 (T123)": T["T1 hi@Mhi"] + T["T2 hi@Mlo"] + T["T3 lo@Mhi"],
    "x4 +T5": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T5 lo2@Mhi")),
    "x4 +T6": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T6 hi@Mlo2")),
    "x4 +T4": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T4 lo@Mlo")),
    "x5 -T4": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T5 lo2@Mhi", "T6 hi@Mlo2")),
    "x5 -T5": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T4 lo@Mlo", "T6 hi@Mlo2")),
    "x5 -T6": sum(T[k_] for k_ in ("T1 hi@Mhi", "T2 hi@Mlo", "T3 lo@Mhi", "T4 lo@Mlo", "T5 lo2@Mhi")),
    "x6 (all)": sum(T[k_] for k_ in list(T)[:6]),
}
ref_scale = np.abs(y_exact).max()
for k_, y in schemes.items():
    e = y - y_exact
    print(f"{k_:<16} rms {np.sqrt((e**2).mean()):.3e}  max {np.abs(e).max():.3e}   (y max {ref_scale:.1f}; bound 2e-7*N = {2e-7*N:.2e})")
