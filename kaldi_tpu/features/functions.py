"""Post-processing: deltas, splicing, sliding-window CMN.

Parity targets: src/feat/feature-functions.h (DeltaFeatures,
SpliceFrames, ShiftedDeltaFeatures), src/feat/online-feature.h
(OnlineSpliceFrames), src/featbin/apply-cmvn-sliding.cc.

All ops are expressed as convolutions / gathers over the whole
utterance matrix so they fuse on device; edges replicate the first and
last frames, matching the reference exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DeltaFeaturesOptions:
    order: int = 2
    window: int = 2


def delta_scales(opts: DeltaFeaturesOptions) -> list[np.ndarray]:
    """Per-order filter coefficients (feature-functions.cc DeltaFeatures ctor)."""
    scales = [np.array([1.0], dtype=np.float64)]
    for i in range(1, opts.order + 1):
        window = opts.window
        prev = scales[i - 1]
        normalizer = sum(j * j for j in range(1, window + 1)) * 2.0
        prev_offset = (len(prev) - 1) // 2
        cur_offset = prev_offset + window
        cur = np.zeros(len(prev) + 2 * window)
        for j in range(-window, window + 1):
            if j != 0:
                for k in range(-prev_offset, prev_offset + 1):
                    cur[j + k + cur_offset] += (j / normalizer) * prev[k + prev_offset]
        scales.append(cur)
    return [s.astype(np.float32) for s in scales]


def add_deltas(feats: jnp.ndarray,
               opts: DeltaFeaturesOptions = DeltaFeaturesOptions()) -> jnp.ndarray:
    """(T, D) → (T, D*(order+1)).  Edge frames are replicated (the
    reference clamps the frame index into [0, T-1])."""
    scales = delta_scales(opts)
    max_off = (len(scales[-1]) - 1) // 2
    T = feats.shape[0]
    # Pad by edge replication once; every order reads from the same pad.
    padded = jnp.concatenate(
        [jnp.repeat(feats[:1], max_off, axis=0), feats,
         jnp.repeat(feats[-1:], max_off, axis=0)], axis=0)
    outs = []
    for s in scales:
        off = (len(s) - 1) // 2
        acc = jnp.zeros_like(feats)
        for j, c in enumerate(s):
            if c == 0.0:
                continue
            start = max_off - off + j
            acc = acc + c * jax.lax.dynamic_slice_in_dim(padded, start, T, axis=0)
        outs.append(acc)
    return jnp.concatenate(outs, axis=1)


def splice_frames(feats: jnp.ndarray, left_context: int,
                  right_context: int) -> jnp.ndarray:
    """(T, D) → (T, D*(l+r+1)) with edge replication
    (feature-functions.cc SpliceFrames)."""
    T = feats.shape[0]
    padded = jnp.concatenate(
        [jnp.repeat(feats[:1], left_context, axis=0), feats,
         jnp.repeat(feats[-1:], right_context, axis=0)], axis=0)
    cols = [jax.lax.dynamic_slice_in_dim(padded, k, T, axis=0)
            for k in range(left_context + right_context + 1)]
    return jnp.concatenate(cols, axis=1)


@dataclasses.dataclass
class SlidingWindowCmnOptions:
    cmn_window: int = 600
    min_window: int = 100
    normalize_variance: bool = False
    center: bool = True


def sliding_window_cmn(feats: np.ndarray,
                       opts: SlidingWindowCmnOptions = SlidingWindowCmnOptions()
                       ) -> np.ndarray:
    """Per-frame mean (and optionally variance) normalization over a
    sliding window (slide-cmn semantics with center=true).  Host-side
    numpy: used in data prep, not the decode hot path."""
    feats = np.asarray(feats, dtype=np.float64)
    T, D = feats.shape
    out = np.empty_like(feats)
    for t in range(T):
        if opts.center:
            lo = t - opts.cmn_window // 2
            hi = lo + opts.cmn_window
            if lo < 0:
                lo, hi = 0, min(opts.cmn_window, T)
            if hi > T:
                hi = T
                lo = max(0, T - opts.cmn_window)
        else:
            lo = max(0, t + 1 - opts.cmn_window)
            hi = max(t + 1, min(opts.min_window, T))
        window = feats[lo:hi]
        mean = window.mean(axis=0)
        out[t] = feats[t] - mean
        if opts.normalize_variance:
            var = np.maximum(window.var(axis=0), 1e-10)
            out[t] /= np.sqrt(var)
    return out.astype(np.float32)
