"""Round-2 knobs: the merge-precision trade and the streaming latency knob.

Run anywhere: python examples/04_precision_and_streaming.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.stream import PartitionedFIR, partitioned_fir_apply

rng = np.random.default_rng(7)

# --- merge precision: explicit speed/accuracy trade (use_avx-flag analog) ---
# Default is fp32-HIGHEST (the only mode inside the reference's 2e-7*N
# error bound). bf16x3 runs the MXU merge ~2x faster at ~1.8e-3 absolute
# error on unit-variance input at N=4096 — an OPT-IN for error-tolerant
# pipelines. The mode is read at trace time: enter the context before the
# first jit of the flow.
n = 4096
x = jnp.asarray(rng.standard_normal((64, n)), jnp.float32)
ref = np.fft.rfft(np.asarray(x, np.float64), axis=-1)

re_hi, im_hi = cf.rfft_packed(x)  # compliant default
with cf.merge_precision("bf16x3"):
    re_lo, im_lo = cf.rfft_packed(x)

err_hi = np.abs(np.asarray(re_hi)[:, 1:] - ref[:, 1 : n // 2].real).max()
err_lo = np.abs(np.asarray(re_lo)[:, 1:] - ref[:, 1 : n // 2].real).max()
print(f"merge precision: highest err {err_hi:.2e}  bf16x3 err {err_lo:.2e} "
      f"(reference bound {2e-7 * n:.1e})")

# --- streaming FDL: latency vs throughput with step_k ---------------------
# step(K=1) is one kernel launch per block (lowest latency); step_k(K)
# amortizes the launch floor over K blocks (measured 69 -> 2.0 us/block at
# K=64 on a v5e); apply_offline processes the whole stream scan-free.
taps, block = 48000, 1024  # a 1-second reverb IR @ 48kHz
h = (rng.standard_normal(taps) * np.exp(-np.linspace(0, 8, taps))).astype(np.float32) / 100
fir = PartitionedFIR(jnp.asarray(h), block=block)

stream_x = rng.standard_normal(16 * block).astype(np.float32)

# real-time loop, 8-block latency budget:
state = fir.init_state()
chunks = stream_x.reshape(-1, 8, block)
outs = []
for c in chunks:
    state, y = fir.step_k(state, jnp.asarray(c))
    outs.append(np.asarray(y).reshape(-1))
y_stream = np.concatenate(outs)

# same math, offline:
y_offline = np.asarray(partitioned_fir_apply(jnp.asarray(stream_x), jnp.asarray(h), block=block))
print(f"streaming(K=8) vs offline max diff: {np.abs(y_stream - y_offline).max():.2e}")

# streaming scan with a chunk knob (jit-friendly single call):
y_chunked = np.asarray(
    partitioned_fir_apply(jnp.asarray(stream_x), jnp.asarray(h), block=block,
                          streaming=True, chunk=8)
)
print(f"chunked-scan vs offline max diff:   {np.abs(y_chunked - y_offline).max():.2e}")
