"""Cepstral mean/variance normalization statistics.

Parity target: src/transform/cmvn.h — ComputeCmvnStats / ApplyCmvn.
Stats layout matches the reference wire format: a (2, dim+1) matrix
  row 0: [sum_1..sum_D, count]
  row 1: [sumsq_1..sumsq_D, 0]
so stats accumulate by plain addition — per-speaker stats are sums of
per-utterance stats, and cross-shard accumulation is a psum.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def compute_cmvn_stats(feats) -> np.ndarray:
    feats = np.asarray(feats, dtype=np.float64)
    T, D = feats.shape
    stats = np.zeros((2, D + 1), dtype=np.float64)
    stats[0, :D] = feats.sum(axis=0)
    stats[0, D] = T
    stats[1, :D] = (feats ** 2).sum(axis=0)
    return stats


def sum_cmvn_stats(stats_list) -> np.ndarray:
    return np.sum([np.asarray(s, dtype=np.float64) for s in stats_list], axis=0)


def apply_cmvn(feats, stats, norm_vars: bool = False):
    """Works on numpy or jnp arrays; returns same flavour as input."""
    xp = jnp if isinstance(feats, jnp.ndarray) else np
    stats = xp.asarray(stats)
    D = feats.shape[1]
    count = stats[0, D]
    mean = stats[0, :D] / count
    out = feats - mean[None, :]
    if norm_vars:
        var = stats[1, :D] / count - mean ** 2
        scale = 1.0 / xp.sqrt(xp.maximum(var, 1e-20))
        out = out * scale[None, :]
    return out
