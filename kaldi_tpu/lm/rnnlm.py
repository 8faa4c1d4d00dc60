"""Recurrent neural network language model + lattice rescoring adapter.

Parity targets: src/rnnlm/ (RnnlmCoreTrainer, and the
KaldiRnnlmDeterministicFst lattice-rescoring adapter — an on-demand
deterministic FST over RNNLM states).  The reference trains with
importance sampling to handle large vocabularies; with full-softmax
training here the sampling machinery is unnecessary (vocabularies in
this build are small; plug a sampled-softmax loss in RnnLm.loss for
the large-vocab case).

RnnLmScorer is the ConstArpa-shaped interface lattice/rescore.compose_lm
consumes: score(history, word) with an internal cache of RNN states
keyed by history prefix — exactly how the reference's deterministic FST
memoizes states per lattice path.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from kaldi_tpu.core.logging import get_logger
from kaldi_tpu.fst.fst import SymbolTable

log = get_logger(__name__)


@dataclasses.dataclass
class RnnLmConfig:
    vocab_size: int = 100
    embed_dim: int = 64
    hidden_dim: int = 128


class RnnLm(nn.Module):
    config: RnnLmConfig

    @nn.compact
    def __call__(self, tokens, carry=None):
        """tokens (B, T) int32 → (logits (B, T, V), final carry)."""
        cfg = self.config
        emb = nn.Embed(cfg.vocab_size, cfg.embed_dim, name="embed")(tokens)
        B = tokens.shape[0]
        if carry is None:
            carry = jnp.zeros((B, cfg.hidden_dim))
        ScanGRU = nn.scan(nn.GRUCell, variable_broadcast="params",
                          split_rngs={"params": False},
                          in_axes=1, out_axes=1)
        carry, hs = ScanGRU(features=cfg.hidden_dim, name="gru")(carry, emb)
        logits = nn.Dense(cfg.vocab_size, name="output")(hs)
        return logits, carry


def train_rnnlm(sentences: Sequence[Sequence[int]], cfg: RnnLmConfig,
                num_epochs: int = 20, batch_size: int = 16,
                learning_rate: float = 5e-3, bos: int = 1, eos: int = 2,
                seed: int = 0):
    """sentences: word-id sequences (without <s>/</s>; added here).
    Returns (params, model)."""
    model = RnnLm(cfg)
    rng = np.random.default_rng(seed)
    T = max(len(s) for s in sentences) + 1
    N = len(sentences)
    inp = np.zeros((N, T), np.int32)
    tgt = np.zeros((N, T), np.int32)
    mask = np.zeros((N, T), bool)
    for i, s in enumerate(sentences):
        seq = [bos] + list(s)
        out = list(s) + [eos]
        inp[i, :len(seq)] = seq
        tgt[i, :len(out)] = out
        mask[i, :len(out)] = True

    params = model.init(jax.random.PRNGKey(seed), inp[:2])["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xi, xt, xm):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, xi)
            lp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(lp, xt[..., None], axis=2)[..., 0]
            return jnp.sum(jnp.where(xm, nll, 0.0)) / jnp.maximum(
                jnp.sum(xm), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    B = min(batch_size, N)
    for epoch in range(num_epochs):
        order = rng.permutation(N)
        tot, nb = 0.0, 0
        for i in range(0, N - B + 1, B):
            idx = order[i:i + B]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(inp[idx]),
                                           jnp.asarray(tgt[idx]),
                                           jnp.asarray(mask[idx]))
            tot += float(loss)
            nb += 1
        if epoch % 5 == 0 or epoch == num_epochs - 1:
            log.info("rnnlm epoch %d: nll/word %.3f (ppl %.1f)", epoch,
                     tot / max(nb, 1), float(np.exp(tot / max(nb, 1))))
    return params, model


class RnnLmScorer:
    """score(history_words, word) → log P, with RNN-state memoization
    (the KaldiRnnlmDeterministicFst role)."""

    def __init__(self, params, model: RnnLm, words: SymbolTable,
                 bos: str = "<s>", eos: str = "</s>"):
        self.params = params
        self.model = model
        self.words = words
        self.bos = bos
        self.eos = eos
        self._cache: Dict[Tuple[str, ...], Tuple[np.ndarray, np.ndarray]] = {}

        @jax.jit
        def step(params, carry, token):
            logits, new_carry = model.apply({"params": params},
                                            token[None, None], carry)
            return jax.nn.log_softmax(logits[0, 0]), new_carry

        self._step = step

    def _state_for(self, hist: Tuple[str, ...]):
        """(logprobs over next word, carry) after consuming hist."""
        if hist in self._cache:
            return self._cache[hist]
        if len(hist) == 0:
            raise ValueError("history must start with <s>")
        if len(hist) == 1:
            carry = jnp.zeros((1, self.model.config.hidden_dim))
            prev_lp = None
        else:
            prev_lp, carry = self._state_for(hist[:-1])
            carry = jnp.asarray(carry)
        tok = self.words.get(hist[-1], 0)
        lp, new_carry = self._step(self.params, carry,
                                   jnp.int32(tok))
        out = (np.asarray(lp), np.asarray(new_carry))
        self._cache[hist] = out
        return out

    def score(self, hist: Tuple[str, ...], word: str) -> float:
        """Natural-log P(word | hist); hist implicitly starts at <s>."""
        full_hist = hist if hist and hist[0] == self.bos \
            else (self.bos,) + tuple(hist)
        lp, _ = self._state_for(full_hist)
        wid = self.words.get(word, 0)
        return float(lp[wid])
