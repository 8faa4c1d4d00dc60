"""TDNN-F acoustic model (the nnet3 'chain' flagship architecture).

Parity target: the reference's nnet3 TDNN-F xconfig models
(egs/librispeech/s5/local/chain/tuning/run_tdnn_1d.sh:
tdnnf-layer with factorized semi-orthogonal bottlenecks, batchnorm,
ReLU, bypass connections, ×3 frame subsampling) — but implemented
natively in flax instead of rebuilding nnet3's computation compiler
(SURVEY.md §7.7: the Descriptor/Compiler machinery is an artifact of
C++ graph execution; XLA *is* the computation compiler here).

Time convolutions are dense matmuls over spliced frames (MXU-shaped);
the factorized layer is Linear(dim→bottleneck over [t−s, t]) followed
by Linear(bottleneck→dim over [t, t+s]) with an L2 semi-orthogonal
penalty on the first factor (the reference enforces semi-orthogonality
by periodic projection in nnet3; here it is a differentiable penalty
added to the training loss — same effect, idiomatic for optax).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def splice(x: jnp.ndarray, offsets: Sequence[int]) -> jnp.ndarray:
    """(B, T, D) → (B, T, D*len(offsets)) taking frames at t+offset
    with edge clamping (nnet3 Offset/Append descriptor semantics).

    Implemented as ONE edge pad + static slices: a time shift is a
    view, not a T-row gather.  (The gather form cost ~10 ns/row on the
    TPU and dominated the TDNN-F forward — ~36 splice gathers per pass
    were ~half the step time; static slices fuse into the matmuls.)"""
    T = x.shape[1]
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    if lo or hi:
        xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="edge")
    else:
        xp = x
    cols = [jax.lax.slice_in_dim(xp, lo + o, lo + o + T, axis=1)
            for o in offsets]
    return jnp.concatenate(cols, axis=-1)


class TdnnFLayer(nn.Module):
    """Factorized TDNN layer with bottleneck + bypass.

    `dtype` is the computation dtype for the matmuls (params stay
    float32): bfloat16 runs the MXU at ~4× the f32 rate — the TPU
    equivalent of the reference's CUDA half-precision kernels."""
    dim: int
    bottleneck: int
    time_stride: int = 1            # context offset s
    bypass_scale: float = 0.66
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # factor 1: constrained (semi-orthogonal), context [t-s, t]
        h = splice(x, (-self.time_stride, 0) if self.time_stride else (0,))
        h = nn.Dense(self.bottleneck, use_bias=False, name="linear",
                     dtype=self.dtype)(h)
        # factor 2: context [t, t+s]
        h = splice(h, (0, self.time_stride) if self.time_stride else (0,))
        h = nn.Dense(self.dim, name="affine", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = h.astype(jnp.float32)
        h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                         use_scale=False, name="batchnorm")(h)
        if self.dropout > 0.0 and train:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        if x.shape[-1] == self.dim:
            h = h + self.bypass_scale * x
        return h


@dataclasses.dataclass
class TdnnConfig:
    feat_dim: int = 40
    num_pdfs: int = 128
    hidden_dim: int = 512
    bottleneck_dim: int = 128
    num_layers: int = 9
    frame_subsampling_factor: int = 3
    # per-layer time strides: early layers short, later dilated (1d recipe)
    strides: Optional[Sequence[int]] = None
    # "bfloat16" runs the matmuls on the MXU's fast path (params and
    # batchnorm stay f32); "float32" is the default/reference-accuracy
    compute_dtype: str = "float32"

    def layer_strides(self) -> Sequence[int]:
        if self.strides is not None:
            return self.strides
        return [1, 1, 1] + [3] * (self.num_layers - 3)


class TdnnChain(nn.Module):
    """Input (B, T, feat_dim) → output (B, T//sub, num_pdfs) log-space
    scores (chain models use un-normalized outputs; the denominator
    normalizes)."""
    config: TdnnConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dt = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
        # input splice ±1 (the lda-ish input context of the 1d recipe)
        h = splice(x, (-1, 0, 1))
        h = nn.Dense(cfg.hidden_dim, name="input_affine", dtype=dt)(h)
        h = nn.relu(h).astype(jnp.float32)
        h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                         use_scale=False, name="input_bn")(h)
        for i, s in enumerate(cfg.layer_strides()):
            h = TdnnFLayer(cfg.hidden_dim, cfg.bottleneck_dim, time_stride=s,
                           dtype=dt, name=f"tdnnf{i + 1}")(h, train=train)
        # frame subsampling: take every k-th frame before the output layers
        k = cfg.frame_subsampling_factor
        if k > 1:
            h = h[:, ::k, :]
        h = nn.Dense(cfg.hidden_dim, name="prefinal", dtype=dt)(h)
        h = nn.relu(h).astype(jnp.float32)
        h = nn.BatchNorm(use_running_average=not train, use_bias=False,
                         use_scale=False, name="prefinal_bn")(h)
        out = nn.Dense(cfg.num_pdfs, name="output_affine",
                       kernel_init=nn.initializers.zeros)(h)
        return out


class RestrictedAttentionLayer(nn.Module):
    """Time-restricted self-attention (nnet-attention-component.h
    RestrictedAttentionComponent): each frame attends to
    [t − left_ctx, t + right_ctx] only — a banded attention mask, which
    keeps the QKᵀ matmul dense (MXU) while bounding the receptive field
    like the reference."""
    dim: int
    num_heads: int = 4
    left_ctx: int = 9
    right_ctx: int = 9
    bypass_scale: float = 0.66

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, D = x.shape
        H = self.num_heads
        dh = self.dim // H
        q = nn.Dense(H * dh, name="query")(x).reshape(B, T, H, dh)
        k = nn.Dense(H * dh, name="key")(x).reshape(B, T, H, dh)
        v = nn.Dense(H * dh, name="value")(x).reshape(B, T, H, dh)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(dh)
        ti = jnp.arange(T)[:, None]
        si = jnp.arange(T)[None, :]
        band = (si >= ti - self.left_ctx) & (si <= ti + self.right_ctx)
        logits = jnp.where(band[None, None], logits, -1e30)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, H * dh)
        out = nn.Dense(self.dim, name="out")(out)
        out = nn.BatchNorm(use_running_average=not train, use_bias=False,
                           use_scale=False, name="batchnorm")(out)
        if D == self.dim:
            out = out + self.bypass_scale * x
        return out


def semi_orthogonal_penalty(params) -> jnp.ndarray:
    """Σ ‖MMᵀ − scale·I‖² over every TDNN-F first factor
    (nnet-utils.cc ConstrainOrthonormal's floating-scale objective)."""
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "linear" in names and names[-1] == "kernel":
            m = leaf.T  # (bottleneck, in)
            p = m @ m.T
            scale = jnp.trace(p) / p.shape[0]
            total = total + jnp.sum((p - scale * jnp.eye(p.shape[0])) ** 2)
    return total
