"""LSTM acoustic models with stateful streaming.

Parity targets: the reference's nnet3 LSTM/BLSTM recipes
(LstmNonlinearityComponent + projection in nnet-simple-component.h,
egs/*/local/chain/tuning/run_lstm*.sh) and the 'looped' online
computation that carries recurrent state across chunks
(decodable-online-looped.h) — here the carried state is explicit:
`apply` returns (scores, carry) and streaming passes carry back in,
so chunked scoring equals offline EXACTLY (no receptive-field
approximation, unlike the TDNN scorer).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class LstmConfig:
    feat_dim: int = 40
    num_pdfs: int = 128
    hidden_dim: int = 256
    proj_dim: int = 128         # recurrent/output projection (LSTMP)
    num_layers: int = 2
    frame_subsampling_factor: int = 3


class LstmpLayer(nn.Module):
    """LSTM with projection (the reference's LSTMP structure)."""
    hidden_dim: int
    proj_dim: int

    @nn.compact
    def __call__(self, x, carry=None):
        """x: (B, T, D) → ((B, T, proj), new_carry)."""
        B = x.shape[0]
        proj = nn.Dense(self.proj_dim, use_bias=False, name="proj")
        if carry is None:
            # OptimizedLSTMCell carry = (c, h), each (B, hidden)
            carry = (jnp.zeros((B, self.hidden_dim)),
                     jnp.zeros((B, self.hidden_dim)))
        ScanLSTM = nn.scan(nn.OptimizedLSTMCell, variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)
        carry, hs = ScanLSTM(self.hidden_dim, name="cell")(carry, x)
        return proj(hs), carry


class LstmChain(nn.Module):
    """Stacked LSTMP → output layer, with optional carried state."""
    config: LstmConfig

    @nn.compact
    def __call__(self, x, carries: Optional[Sequence] = None,
                 train: bool = False):
        cfg = self.config
        new_carries = []
        h = x
        for i in range(cfg.num_layers):
            layer = LstmpLayer(cfg.hidden_dim, cfg.proj_dim,
                               name=f"lstm{i + 1}")
            c = carries[i] if carries is not None else None
            h, nc = layer(h, c)
            new_carries.append(nc)
        k = cfg.frame_subsampling_factor
        if k > 1:
            h = h[:, k - 1::k, :]      # take the last frame of each block
        out = nn.Dense(cfg.num_pdfs, name="output_affine",
                       kernel_init=nn.initializers.zeros)(h)
        return out, new_carries


class StreamingLstmScorer:
    """Chunked scoring carrying LSTM state — exactly equals offline.

    Chunks must be multiples of the subsampling factor (pad the last)."""

    def __init__(self, params, model: LstmChain):
        self.params = params
        self.model = model
        self._carries = None

        @jax.jit
        def step(params, x, carries):
            return model.apply({"params": params}, x, carries)

        self._step = step

    def reset(self) -> None:
        self._carries = None

    def accept_features(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) chunk (T % subsample == 0) → (T // sub, P) scores."""
        k = self.model.config.frame_subsampling_factor
        assert feats.shape[0] % k == 0, "chunk must be a multiple of sub"
        scores, self._carries = self._step(
            self.params, jnp.asarray(feats[None], jnp.float32),
            self._carries)
        return np.asarray(scores[0])
