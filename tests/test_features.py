"""Feature frontend tests with NumPy oracles.

Follows the reference test strategy (SURVEY.md §4): the slow, obviously-
correct NumPy implementation is the oracle for the fused JAX path —
the same pattern as src/cudamatrix/cu-matrix-test.cc (CPU vs GPU) and
src/feat/feature-mfcc-test.cc.
"""

import math

import numpy as np
import pytest

from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    Fbank,
    FbankOptions,
    FrameExtractionOptions,
    MelBanks,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    Plp,
    PlpOptions,
    Spectrogram,
    add_deltas,
    apply_cmvn,
    compute_cmvn_stats,
    compute_dct_matrix,
    extract_frames,
    feature_window_function,
    num_frames,
    splice_frames,
    sum_cmvn_stats,
    sliding_window_cmn,
    SlidingWindowCmnOptions,
)
from kaldi_tpu.features.window import process_window


def _opts(**kw):
    base = dict(dither=0.0, samp_freq=16000.0)
    base.update(kw)
    return FrameExtractionOptions(**base)


def test_num_frames_snip_edges():
    opts = _opts()
    assert opts.window_size == 400 and opts.window_shift == 160
    assert num_frames(400, opts) == 1
    assert num_frames(399, opts) == 0
    assert num_frames(560, opts) == 2
    assert num_frames(16000, opts) == 98
    opts2 = _opts(snip_edges=False)
    assert num_frames(16000, opts2) == 100


def test_window_functions():
    opts = _opts()
    for wt in ["povey", "hamming", "hanning", "rectangular", "blackman"]:
        opts.window_type = wt
        w = feature_window_function(opts)
        assert w.shape == (400,)
        assert np.all(np.isfinite(w))
    opts.window_type = "povey"
    w = feature_window_function(opts)
    # povey = hanning^0.85
    opts.window_type = "hanning"
    h = feature_window_function(opts)
    np.testing.assert_allclose(w, h ** 0.85, atol=1e-6)


def test_extract_frames_strided(rng):
    opts = _opts()
    wave = rng.standard_normal(1000).astype(np.float32)
    frames = extract_frames(wave, opts)
    assert frames.shape == (4, 400)
    np.testing.assert_array_equal(frames[0], wave[:400])
    np.testing.assert_array_equal(frames[3], wave[480:880])


def test_extract_frames_reflection(rng):
    opts = _opts(snip_edges=False)
    wave = rng.standard_normal(800).astype(np.float32)
    frames = extract_frames(wave, opts)
    # frame 0 midpoint is at sample 80; window starts at -120 → reflect
    np.testing.assert_array_equal(frames[0][:120], wave[:120][::-1])


def test_process_window_oracle(rng):
    """JAX process_window vs step-by-step numpy."""
    opts = _opts()
    wave = rng.standard_normal(2000).astype(np.float32)
    frames = extract_frames(wave, opts)
    window = feature_window_function(opts)
    got_frames, got_loge = process_window(frames, window, opts)
    got_frames, got_loge = np.asarray(got_frames), np.asarray(got_loge)
    for i, f in enumerate(frames):
        f = f - f.mean()
        loge = math.log(max((f ** 2).sum(), 1e-38))
        pre = f.copy()
        pre[1:] -= opts.preemph_coeff * f[:-1]
        pre[0] -= opts.preemph_coeff * f[0]
        ref = pre * window
        np.testing.assert_allclose(got_frames[i, :400], ref, rtol=2e-5, atol=1e-5)
        assert abs(got_loge[i] - loge) < 1e-4
        np.testing.assert_array_equal(got_frames[i, 400:], 0.0)


def test_mel_banks_partition():
    """Triangles are nonnegative and each FFT bin in band is covered."""
    frame_opts = _opts()
    mel = MelBanks(MelBanksOptions(num_bins=23), frame_opts)
    m = mel.matrix
    assert m.shape == (23, 257)
    assert np.all(m >= 0.0)
    assert np.all(m.sum(axis=1) > 0)
    # Interior FFT bins between first and last center freq have coverage.
    bin_hz = 16000.0 / 512
    lo = int(np.ceil(mel.center_freqs[0] / bin_hz)) + 1
    hi = int(np.floor(mel.center_freqs[-1] / bin_hz)) - 1
    cover = m.sum(axis=0)
    assert np.all(cover[lo:hi] > 0.0)
    # Centers are increasing.
    assert np.all(np.diff(mel.center_freqs) > 0)


def test_dct_orthonormal():
    d = compute_dct_matrix(23, 23)
    np.testing.assert_allclose(d @ d.T, np.eye(23), atol=1e-5)


def test_mfcc_oracle(rng):
    """Full MFCC vs a straight-line numpy implementation."""
    opts = MfccOptions(frame_opts=_opts())
    mfcc = Mfcc(opts)
    wave = (rng.standard_normal(16000) * 100).astype(np.float32)
    got = mfcc.compute(wave)
    assert got.shape == (98, 13)

    frames = extract_frames(wave, opts.frame_opts)
    window = feature_window_function(opts.frame_opts)
    mel = MelBanks(opts.mel_opts, opts.frame_opts).matrix
    dct = compute_dct_matrix(13, 23)
    lifter = 1.0 + 0.5 * 22.0 * np.sin(math.pi * np.arange(13) / 22.0)
    ref = np.zeros((len(frames), 13), dtype=np.float64)
    for i, f in enumerate(frames):
        f = f.astype(np.float64)
        f = f - f.mean()
        loge = math.log(max((f ** 2).sum(), 1e-38))
        pre = f.copy()
        pre[1:] -= 0.97 * f[:-1]
        pre[0] -= 0.97 * f[0]
        fw = np.concatenate([pre * window, np.zeros(112)])
        spec = np.fft.rfft(fw)
        power = np.abs(spec) ** 2
        mel_e = np.maximum(mel.astype(np.float64) @ power, 1e-38)
        ceps = dct.astype(np.float64) @ np.log(mel_e)
        ceps *= lifter
        ceps[0] = loge
        ref[i] = ceps
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_fbank_shapes_and_energy(rng):
    wave = (rng.standard_normal(8000) * 50).astype(np.float32)
    fb = Fbank(FbankOptions(frame_opts=_opts()))
    out = fb.compute(wave)
    assert out.shape == (48, 23)
    assert np.all(np.isfinite(out))
    fb_e = Fbank(FbankOptions(frame_opts=_opts(), use_energy=True))
    out_e = fb_e.compute(wave)
    assert out_e.shape == (48, 24)
    np.testing.assert_allclose(out_e[:, 1:], out, atol=1e-5)


def test_fbank_parseval(rng):
    """Linear (non-log) power fbank total ≈ windowed-signal energy in band."""
    wave = np.sin(2 * np.pi * 1000 * np.arange(4000) / 16000).astype(np.float32)
    fb = Fbank(FbankOptions(frame_opts=_opts(preemph_coeff=0.0,
                                             remove_dc_offset=False),
                            use_log_fbank=False))
    out = fb.compute(wave * 1000)
    # a 1 kHz tone excites a couple of adjacent mel bins only
    peak_bins = np.argsort(out.mean(axis=0))[-3:]
    rest = out.mean(axis=0).sum() - out.mean(axis=0)[peak_bins].sum()
    assert out.mean(axis=0)[peak_bins].sum() > 50 * max(rest, 1e-10)


def test_spectrogram(rng):
    wave = (rng.standard_normal(4000) * 10).astype(np.float32)
    sp = Spectrogram()
    sp.opts.frame_opts.dither = 0.0
    out = sp.compute(wave)
    assert out.shape == (23, 257)
    assert np.all(np.isfinite(out))


def test_plp_finite_and_shaped(rng):
    wave = (rng.standard_normal(8000) * 100).astype(np.float32)
    plp = Plp(PlpOptions(frame_opts=_opts()))
    out = plp.compute(wave)
    assert out.shape == (48, 13)
    assert np.all(np.isfinite(out))
    # Energy column should track loudness.
    quiet = plp.compute(wave * 0.01)
    assert quiet[:, 0].mean() < out[:, 0].mean()


def test_deltas_oracle(rng):
    """add_deltas vs direct per-frame oracle computation."""
    feats = rng.standard_normal((20, 3)).astype(np.float32)
    opts = DeltaFeaturesOptions(order=2, window=2)
    got = np.asarray(add_deltas(feats, opts))
    assert got.shape == (20, 9)
    np.testing.assert_allclose(got[:, :3], feats, atol=1e-6)
    # First-order delta oracle: sum_j j*x[t+j] / (2*sum j^2), clamped indices.
    norm = 2.0 * (1 + 4)
    for t in range(20):
        ref = np.zeros(3)
        for j in range(-2, 3):
            tc = min(max(t + j, 0), 19)
            ref += j / norm * feats[tc]
        np.testing.assert_allclose(got[t, 3:6], ref, rtol=1e-4, atol=1e-5)


def test_deltas_constant_input():
    """Deltas of a constant signal are zero (including at edges)."""
    feats = np.ones((10, 4), dtype=np.float32) * 3.0
    got = np.asarray(add_deltas(feats))
    np.testing.assert_allclose(got[:, 4:], 0.0, atol=1e-5)


def test_splice(rng):
    feats = rng.standard_normal((6, 2)).astype(np.float32)
    got = np.asarray(splice_frames(feats, 2, 1))
    assert got.shape == (6, 8)
    np.testing.assert_array_equal(got[3, :2], feats[1])
    np.testing.assert_array_equal(got[3, 2:4], feats[2])
    np.testing.assert_array_equal(got[3, 4:6], feats[3])
    np.testing.assert_array_equal(got[3, 6:8], feats[4])
    # Edge replication
    np.testing.assert_array_equal(got[0, :2], feats[0])
    np.testing.assert_array_equal(got[0, 2:4], feats[0])
    np.testing.assert_array_equal(got[5, 6:8], feats[5])


def test_cmvn(rng):
    feats = (rng.standard_normal((50, 5)) * 3 + 7).astype(np.float32)
    stats = compute_cmvn_stats(feats)
    out = apply_cmvn(feats, stats, norm_vars=True)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)
    # Stats add like the reference's gmm-sum-accs pattern.
    s1 = compute_cmvn_stats(feats[:20])
    s2 = compute_cmvn_stats(feats[20:])
    np.testing.assert_allclose(sum_cmvn_stats([s1, s2]), stats, rtol=1e-10)


def test_sliding_cmn(rng):
    feats = (rng.standard_normal((30, 4)) + 5).astype(np.float32)
    out = sliding_window_cmn(feats, SlidingWindowCmnOptions(cmn_window=10))
    assert out.shape == feats.shape
    # Window >= T degenerates to global CMN.
    out2 = sliding_window_cmn(feats, SlidingWindowCmnOptions(cmn_window=100))
    ref = feats - feats.mean(axis=0)
    np.testing.assert_allclose(out2, ref, atol=1e-4)
