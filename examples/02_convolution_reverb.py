"""Fast convolution: the library's raison d'etre, scaled to a reverb engine.

Run anywhere: python examples/02_convolution_reverb.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu.models import ConvolverConfig, MultichannelConvolver

rng = np.random.default_rng(1)

# --- one-shot circular convolution through the unordered packed path ----
n = 8192
x = jnp.asarray(rng.standard_normal((4, n)), jnp.float32)
h = jnp.asarray(rng.standard_normal((4, n)) / 64, jnp.float32)
A = cf.rfft_packed_unordered(x)
B = cf.rfft_packed_unordered(h)
pr, pi = cf.convolve_accumulate_packed(A, B, scaling=1.0 / n)
y = cf.irfft_packed_unordered(pr, pi)  # circular conv, no reorder ever paid
print("circular conv out:", y.shape)

# Same result, one kernel fewer HBM round trips: the spectral product is
# fused into the inverse kernel (round 3).
y_fused = cf.convolve_irfft_packed(*A, *B, scaling=1.0 / n, ordered=False)
print("fused conv max diff:", float(jnp.abs(y - y_fused).max()))

# --- a 64-channel convolution reverb (2 s impulse responses @ 48 kHz) ---
channels, seconds, sr = 64, 2, 48000
ir = (rng.standard_normal((channels, seconds * sr)) *
      np.exp(-np.linspace(0, 8, seconds * sr))).astype(np.float32) / 100
conv = MultichannelConvolver(jnp.asarray(ir), ConvolverConfig(channels=channels, block=4096))

audio = jnp.asarray(rng.standard_normal((channels, 10 * sr)), jnp.float32)
wet = jax.jit(conv.apply)(audio)  # batched offline FDL, no scan
print("reverb out:", wet.shape)

# Streaming mode (real-time block processing, O(1) state):
state = conv.init_state()
state, out_block = conv.step(state, audio[:, : conv.config.block])
print("streaming block out:", out_block.shape)
