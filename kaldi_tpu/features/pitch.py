"""Pitch extraction.

Parity target: src/feat/pitch-functions.h (ComputeKaldiPitch — the
Kaldi pitch tracker: NCCF over candidate lags, Viterbi smoothing of the
lag track, POV (probability-of-voicing) and normalized-log-pitch
outputs; ProcessPitch post-processing).

This implementation keeps the algorithm's structure (NCCF → per-frame
lag candidates → Viterbi with log-lag transition cost → POV/pitch
features) with simplified constants; the NCCF batch is vectorized
numpy (device offload is possible but pitch is far off the hot path).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from kaldi_tpu.core.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class PitchExtractionOptions:
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    penalty_factor: float = 0.1
    nccf_ballast: float = 7000.0
    soft_min_f0: float = 10.0


def compute_kaldi_pitch(wave: np.ndarray,
                        opts: PitchExtractionOptions = None) -> np.ndarray:
    """→ (num_frames, 2): [pov_feature, pitch_hz] per frame."""
    o = opts or PitchExtractionOptions()
    sf = o.samp_freq
    shift = int(sf * o.frame_shift_ms / 1000)
    length = int(sf * o.frame_length_ms / 1000)
    wave = np.asarray(wave, np.float64)
    min_lag = int(sf / o.max_f0)
    max_lag = int(sf / o.min_f0)
    win = length + max_lag
    T = max(0, (len(wave) - win) // shift + 1)
    if T == 0:
        return np.zeros((0, 2), np.float32)

    lags = np.arange(min_lag, max_lag + 1)
    # ballast is relative to the signal's own energy (the reference
    # scales it by the mean-square energy so quiet frames read as
    # unvoiced regardless of absolute amplitude units)
    msq = float(np.mean(wave ** 2)) + 1e-20
    ballast = (o.nccf_ballast / 7000.0) * (msq * length) ** 2
    nccf = np.zeros((T, len(lags)))       # ballasted (for lag selection)
    nccf_pov = np.zeros((T, len(lags)))   # ballast-free (for POV)
    for t in range(T):
        s = t * shift
        x = wave[s:s + length]
        e1 = np.dot(x, x)
        for i, lag in enumerate(lags):
            y = wave[s + lag:s + lag + length]
            e2 = np.dot(y, y)
            inner = np.dot(x, y)
            nccf[t, i] = inner / max(math.sqrt(e1 * e2 + ballast), 1e-20)
            nccf_pov[t, i] = inner / max(math.sqrt(e1 * e2), 1e-20)

    # Viterbi over lag candidates: reward NCCF, penalize log-lag jumps;
    # a small short-lag preference breaks octave ties toward the true F0
    L = len(lags)
    loglag = np.log(lags)
    octave_bias = 0.02 * (loglag - loglag[0])
    cost = np.full((T, L), np.inf)
    back = np.zeros((T, L), np.int32)
    cost[0] = -nccf[0] + octave_bias
    for t in range(1, T):
        trans = o.penalty_factor * (loglag[None, :] - loglag[:, None]) ** 2
        total = cost[t - 1][:, None] + trans
        back[t] = np.argmin(total, axis=0)
        cost[t] = total[back[t], np.arange(L)] - nccf[t] + octave_bias
    path = np.zeros(T, np.int32)
    path[-1] = int(np.argmin(cost[-1]))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]

    out = np.zeros((T, 2), np.float32)
    for t in range(T):
        i = int(path[t])
        c = np.clip(nccf_pov[t, i], -1.0, 1.0)
        # POV feature (pitch-functions.cc NccfToPovFeature shape)
        out[t, 0] = 2.0 / (1.0 + np.exp(-10.0 * (c - 0.5))) - 1.0
        # sub-sample lag via parabolic interpolation of the NCCF peak
        # (the reference gets sub-sample resolution by upsampling the
        # NCCF with ArbitraryResample; a parabola through the peak and
        # neighbours is the standard closed-form equivalent and cuts
        # the integer-lag quantization error ~10x)
        lag = float(lags[i])
        if 0 < i < L - 1:
            c0, c1, c2 = nccf_pov[t, i - 1], nccf_pov[t, i], nccf_pov[t, i + 1]
            denom = c0 - 2.0 * c1 + c2
            if denom < -1e-12:
                delta = 0.5 * (c0 - c2) / denom
                lag += float(np.clip(delta, -0.5, 0.5))
        out[t, 1] = sf / lag
    return out


def process_pitch(pitch: np.ndarray, pov_scale: float = 2.0,
                  pitch_scale: float = 2.0, delta_scale: float = 10.0,
                  normalization_window: int = 151) -> np.ndarray:
    """(T, 2) [pov_feature, pitch_hz] → (T, 3) processed features
    [pov, normalized-log-pitch, delta-pitch], the ProcessPitch /
    paste-able add-pitch feature layout (pitch-functions.cc
    ProcessPitchOptions defaults: POV-weighted sliding-window mean
    subtraction of log-pitch, scaled delta)."""
    T = pitch.shape[0]
    if T == 0:
        return np.zeros((0, 3), np.float32)
    pov = pitch[:, 0].astype(np.float64)
    logp = np.log(np.maximum(pitch[:, 1].astype(np.float64), 1e-10))
    # POV weights in [0,1] for the weighted running mean
    w = np.clip((pov + 1.0) / 2.0, 1e-3, 1.0)
    half = normalization_window // 2
    norm = np.empty(T)
    csw = np.concatenate([[0.0], np.cumsum(w)])
    cswp = np.concatenate([[0.0], np.cumsum(w * logp)])
    for t in range(T):
        lo, hi = max(0, t - half), min(T, t + half + 1)
        norm[t] = (cswp[hi] - cswp[lo]) / (csw[hi] - csw[lo])
    normalized = logp - norm
    delta = np.zeros(T)
    if T > 1:
        delta[1:] = logp[1:] - logp[:-1]
        delta[0] = delta[1]
    out = np.stack([pov_scale * pov, pitch_scale * normalized,
                    delta_scale * delta], axis=1)
    return out.astype(np.float32)
