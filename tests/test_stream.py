"""Streaming layer tests: OLS FIR (single + partitioned), polyphase,
demod, channelizer — differential against scipy/numpy float64."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.signal as sig

import chowdsp_fft_tpu as cf
from chowdsp_fft_tpu import stream


def lfilter_ref(h, x):
    return sig.lfilter(h.astype(np.float64), [1.0], x.astype(np.float64), axis=-1)


# ---------------------------------------------------------------------------
# Overlap-save
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("taps,t", [(33, 4000), (129, 10000), (4096, 20000)])
def test_fir_filter_ols_matches_lfilter(taps, t, rng):
    x = rng.standard_normal((3, t)).astype(np.float32)
    h = rng.standard_normal(taps).astype(np.float32) / np.sqrt(taps)
    y = np.asarray(stream.fir_filter_ols(x, h))
    ref = lfilter_ref(h, x)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, ref, atol=5e-4, rtol=0)


def test_fir_filter_ols_explicit_block(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    h = rng.standard_normal(65).astype(np.float32) / 8
    y = np.asarray(stream.fir_filter_ols(x, h, block=512))
    np.testing.assert_allclose(y, lfilter_ref(h, x), atol=5e-4, rtol=0)


@pytest.mark.parametrize("taps,block", [(4096, 1024), (3000, 512)])
def test_partitioned_fir_matches_lfilter(taps, block, rng):
    t = 16384
    x = rng.standard_normal(t).astype(np.float32)
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    y = np.asarray(stream.partitioned_fir_apply(x, h, block=block))
    ref = lfilter_ref(h, x)
    assert y.shape == (t,)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=0)


def test_partitioned_fir_batched(rng):
    t, taps = 8192, 2048
    x = rng.standard_normal((4, t)).astype(np.float32)
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    y = np.asarray(stream.partitioned_fir_apply(x, h, block=1024))
    ref = lfilter_ref(h, x)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=0)


def test_partitioned_fir_ir_longer_than_signal(rng):
    """Regression (ADVICE r1): an IR with more partitions than the signal
    has blocks (reverb IR longer than the buffer) used to fail with an
    opaque broadcast error in the offline path; streaming handled it."""
    block, t = 256, 512  # nb = 2 blocks
    taps = 5 * block  # 5 partitions > 2 blocks
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    x = rng.standard_normal(t).astype(np.float32)
    y = np.asarray(stream.partitioned_fir_apply(x, h, block=block))
    ref = lfilter_ref(h, x)
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=0)


def test_partitioned_fir_step_streaming_equivalence(rng):
    """Block-by-block streaming must equal one-shot filtering (state
    carry correctness — the checkpoint/resume analog for DSP state)."""
    taps, block, nb = 1500, 512, 10
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    x = rng.standard_normal(nb * block).astype(np.float32)
    fir = stream.PartitionedFIR(h, block=block)
    st = fir.init_state()
    outs = []
    for i in range(nb):
        st, y = fir.step(st, x[i * block : (i + 1) * block])
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    ref = lfilter_ref(h, x)
    np.testing.assert_allclose(y_stream, ref, atol=1e-3, rtol=0)


def test_partitioned_fir_streaming_chunked(rng):
    """streaming=True with chunk=K (scan over step_k) == plain streaming
    == lfilter, including a T that doesn't divide K*block."""
    taps, block, t = 1200, 256, 256 * 11 - 37
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    x = rng.standard_normal(t).astype(np.float32)
    ref = lfilter_ref(h, x)
    for k in (1, 4, 16):
        y = np.asarray(
            stream.partitioned_fir_apply(x, h, block=block, streaming=True, chunk=k)
        )
        np.testing.assert_allclose(y, ref, atol=1e-3, rtol=0, err_msg=f"chunk={k}")


def test_partitioned_fir_step_k_equivalence(rng):
    """K-block batched stepping == K sequential steps == lfilter (round 2:
    the latency/throughput knob between step and apply_offline)."""
    taps, block = 1500, 256
    h = (rng.standard_normal(taps) / np.sqrt(taps)).astype(np.float32)
    fir = stream.PartitionedFIR(h, block=block)
    nb = 12
    x = rng.standard_normal(nb * block).astype(np.float32)
    xk = x.reshape(nb, block)

    # one step_k over all blocks
    st = fir.init_state()
    _, yk = fir.step_k(st, jnp.asarray(xk))
    ref = lfilter_ref(h, x)
    np.testing.assert_allclose(np.asarray(yk).reshape(-1), ref, atol=1e-3, rtol=0)

    # mixed chunk sizes carry state correctly (K=5 then K=7)
    st = fir.init_state()
    st, y1 = fir.step_k(st, jnp.asarray(xk[:5]))
    st, y2 = fir.step_k(st, jnp.asarray(xk[5:]))
    got = np.concatenate([np.asarray(y1).reshape(-1), np.asarray(y2).reshape(-1)])
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=0)

    # equals sequential step()s
    st1 = fir.init_state()
    outs = []
    for i in range(nb):
        st1, y = fir.step(st1, xk[i])
        outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.asarray(yk).reshape(-1), np.concatenate(outs), atol=1e-4, rtol=0
    )


# ---------------------------------------------------------------------------
# Polyphase
# ---------------------------------------------------------------------------


def test_polyphase_decimate_matches_filter_then_downsample(rng):
    t, taps, d = 4096, 48, 4
    x = rng.standard_normal(t).astype(np.float32)
    h = np.asarray(stream.design_lowpass(taps, 1.0 / d))
    y = np.asarray(stream.polyphase_decimate(x, h, d))
    ref = lfilter_ref(h, x)[::d]
    assert y.shape == ref.shape
    np.testing.assert_allclose(y, ref, atol=1e-5, rtol=0)


def test_polyphase_interpolate_tone(rng):
    # Upsampling a tone keeps its frequency and ~unit passband gain.
    fs, f0, up = 1000.0, 37.0, 4
    t = np.arange(2048) / fs
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    h = np.asarray(stream.design_lowpass(64, 1.0 / up))
    y = np.asarray(stream.polyphase_interpolate(x, h, up))
    assert y.shape[-1] == 2048 * up
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(y.size - 2000)))
    peak = np.argmax(spec)
    expected = f0 / (fs * up / 2) * (spec.size - 1)
    assert abs(peak - expected) <= 2


def test_design_lowpass_dc_gain():
    h = np.asarray(stream.design_lowpass(101, 0.25))
    assert abs(h.sum() - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# Demod
# ---------------------------------------------------------------------------


def test_fm_demod_recovers_message():
    fs = 48000.0
    t = np.arange(8192) / fs
    msg = np.sin(2 * np.pi * 400 * t)
    kf = 2 * np.pi * 3000 / fs  # frequency deviation per sample
    phase = np.cumsum(kf * msg)
    z = np.exp(1j * phase).astype(np.complex64)
    y = np.asarray(stream.fm_demod(z, gain=1.0 / kf))
    # Skip transient; compare against the message (one-sample delay ~ none)
    np.testing.assert_allclose(y[10:], msg[10:], atol=0.02, rtol=0)


def test_am_demod():
    z = (3.0 + 0j) * np.exp(1j * np.linspace(0, 10, 100)).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(stream.am_demod(z)), 3.0, atol=1e-5)


def test_dc_block_removes_dc(rng):
    x = (rng.standard_normal(8192) + 5.0).astype(np.float32)
    y = np.asarray(stream.dc_block(x))
    assert abs(y[4000:].mean()) < 0.15
    # matches scipy lfilter([1,-1],[1,-alpha])
    ref = sig.lfilter([1, -1], [1, -0.995], x.astype(np.float64))
    np.testing.assert_allclose(y, ref, atol=1e-3, rtol=0)


# ---------------------------------------------------------------------------
# Channelizer
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [16, 64])
def test_channelizer_tone_lands_in_right_channel(channels, rng):
    c = channels
    steps = 256
    t = np.arange(c * steps)
    for ch in [1, c // 2 - 1, c - 2]:
        z = np.exp(2j * np.pi * (ch / c) * t).astype(np.complex64)
        y = np.asarray(stream.channelize(z, c, taps_per_branch=8))
        assert y.shape == (c, steps)
        power = (np.abs(y) ** 2).mean(axis=-1)
        assert power.argmax() == ch, f"tone at ch {ch} landed in {power.argmax()}"
        # selectivity: winning channel dominates
        others = np.delete(power, ch)
        assert power[ch] > 20 * others.max()


def test_channelizer_real_input(rng):
    c, steps = 32, 128
    x = rng.standard_normal(c * steps).astype(np.float32)
    y = np.asarray(stream.channelize(x, c))
    assert y.shape == (c, steps)
    assert np.all(np.isfinite(y))


def test_channelizer_invalid_channels():
    with pytest.raises(cf.InvalidSizeError):
        stream.Channelizer(7)


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_fft,hop", [(512, 256), (512, 128), (1024, 512)])
def test_stft_istft_roundtrip(n_fft, hop, rng):
    t = 8192
    x = rng.standard_normal((2, t)).astype(np.float32)
    s = stream.stft(x, n_fft=n_fft, hop=hop)
    back = np.asarray(stream.istft(s, hop=hop, length=t))
    assert back.shape == x.shape
    assert np.abs(back - x).max() < 1e-4


def test_stft_matches_naive_frames(rng):
    """Frame f of the STFT equals rfft(window * x[f*hop-pad : ... ])."""
    n_fft, hop, t = 256, 128, 1024
    x = rng.standard_normal(t).astype(np.float32)
    s = np.asarray(stream.stft(x, n_fft=n_fft, hop=hop))
    w = np.asarray(stream.hann_window(n_fft), np.float64)
    pad = n_fft - hop
    xp = np.pad(x.astype(np.float64), (pad, n_fft))
    for f in (0, 3, 7):
        frame = xp[f * hop : f * hop + n_fft] * w
        ref = np.fft.rfft(frame)
        assert np.abs(s[f] - ref).max() < 2e-7 * n_fft * 4


def test_spectrogram_shape_and_positivity(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    p = np.asarray(stream.spectrogram(x, n_fft=512, hop=256))
    assert p.ndim == 2 and p.shape[1] == 257
    assert (p >= 0).all()


# ---------------------------------------------------------------------------
# Regression tests for the code-review findings
# ---------------------------------------------------------------------------


def test_channelizer_matches_mixer_definition(rng):
    """An analysis channelizer must equal mix-down -> prototype lowpass ->
    decimate (up to the filterbank's fixed per-channel alignment). This is
    the independent definition; it caught a delay-reversed branch filter."""
    c, k, steps = 16, 8, 192
    t = c * steps
    n = np.arange(t)
    z = (rng.standard_normal(t) + 1j * rng.standard_normal(t)).astype(np.complex64)
    got = np.asarray(stream.channelize(z, c, taps_per_branch=k))
    proto = np.asarray(stream.design_lowpass(c * k, 1.0 / c), np.float64)
    for ch in (0, 3, c - 1):
        mixed = z.astype(np.complex128) * np.exp(-2j * np.pi * ch * n / c)
        filt = sig.lfilter(proto, [1.0], mixed)
        # Commutator convention: channel streams sample the filtered mix at
        # m*C + C-1, with gain 1/C and the standard time-origin phase
        # exp(2j*pi*ch*(C-1)/C).
        ref = (
            filt[c - 1 :: c][:steps]
            * np.exp(2j * np.pi * ch * (c - 1) / c)
            / c
        )
        err = np.abs(got[ch] - ref).max() / max(np.abs(ref).max(), 1e-12)
        assert err < 1e-4, (ch, err)


def test_polyphase_interpolate_zero_state_alignment(rng):
    """y[n] = factor * sum_k h[k] u[n-k] (zero state, no warmup drop)."""
    x = rng.standard_normal(257).astype(np.float32)
    h = rng.standard_normal(33).astype(np.float32) / 8
    up = 4
    y = np.asarray(stream.polyphase_interpolate(x, h, up))
    u = np.zeros(x.size * up)
    u[::up] = x.astype(np.float64)
    ref = up * sig.lfilter(h.astype(np.float64), [1.0], u)
    np.testing.assert_allclose(y, ref, atol=2e-5)


def test_polyphase_interpolate_framed_matches_short(rng):
    """Long-stream framed path == short path (same zero-state math)."""
    x = rng.standard_normal(20000).astype(np.float32)
    h = rng.standard_normal(63).astype(np.float32) / 8
    y_framed = np.asarray(stream.polyphase_interpolate(x, h, 2, block=2048))
    y_short = np.asarray(stream.polyphase_interpolate(x, h, 2, block=100000))
    np.testing.assert_allclose(y_framed, y_short, atol=2e-5)


def test_polyphase_updown_roundtrip_alignment(rng):
    """interpolate(f) then decimate(f) preserves timing (no shift)."""
    x = rng.standard_normal(4096).astype(np.float32)
    up = 4
    h = np.asarray(stream.design_lowpass(128, 0.9 / up), np.float32)
    y = np.asarray(
        stream.polyphase_decimate(stream.polyphase_interpolate(x, h, up), h, up)
    )
    # Compare against the double-filter reference with the same zero-state
    # conventions (group delay of h*h remains, but no extra shift).
    u = np.zeros(x.size * up)
    u[::up] = x.astype(np.float64)
    ref_hi = up * sig.lfilter(h.astype(np.float64), [1.0], u)
    ref = sig.lfilter(h.astype(np.float64), [1.0], ref_hi)[::up][: y.size]
    np.testing.assert_allclose(y, ref, atol=2e-4)


def test_polyphase_decimate_length_consistent_across_block(rng):
    x = rng.standard_normal(1001).astype(np.float32)
    h = rng.standard_normal(21).astype(np.float32) / 4
    a = np.asarray(stream.polyphase_decimate(x, h, 3, block=4096))
    b = np.asarray(stream.polyphase_decimate(x, h, 3, block=256))
    assert a.shape == b.shape == (1001 // 3,)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_fir_filter_ols_middle_ndim_filter(rng):
    """h with batch dims below x's rank broadcasts per-stream, not per-frame."""
    x = rng.standard_normal((4, 2, 3000)).astype(np.float32)
    h = (rng.standard_normal((2, 65)) / 8).astype(np.float32)
    y = np.asarray(stream.fir_filter_ols(x, h))
    for i in range(4):
        for j in range(2):
            ref = lfilter_ref(h[j], x[i, j])
            np.testing.assert_allclose(y[i, j], ref, atol=5e-4)


def test_stft_accepts_traced_window(rng):
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal(2048).astype(np.float32)
    w = jnp.asarray(np.hanning(512).astype(np.float32))
    f = jax.jit(lambda v, ww: stream.stft(v, n_fft=512, hop=256, window=ww))
    s = f(jnp.asarray(x), w)
    assert s.shape[-1] == 257
