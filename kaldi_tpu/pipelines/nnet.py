"""Frame-level cross-entropy NN acoustic model training ('xent' systems).

Parity target: steps/nnet3/train_dnn.py + nnet3-train — the non-chain
DNN recipe: train a TDNN on per-frame pdf targets from GMM alignments;
decode with pseudo-log-likelihoods  log p(pdf|x) − log prior(pdf)
(src/nnet3/decodable-simple-looped.h's acoustic-probability convention).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kaldi_tpu.core.logging import get_logger
from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig

log = get_logger(__name__)


@dataclasses.dataclass
class XentTrainConfig:
    num_epochs: int = 20
    batch_size: int = 16
    chunk_size: int = 64
    learning_rate: float = 1e-3


class XentTrainer:
    """Cross-entropy trainer over fixed chunks (subsampling factor 1)."""

    def __init__(self, model_cfg: TdnnConfig, cfg: XentTrainConfig = None,
                 seed: int = 0):
        assert model_cfg.frame_subsampling_factor == 1, \
            "xent systems decode at the full frame rate"
        self.cfg = cfg or XentTrainConfig()
        self.model = TdnnChain(model_cfg)
        self.num_pdfs = model_cfg.num_pdfs
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((2, 16, model_cfg.feat_dim))
        variables = self.model.init(rng, dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.adam(self.cfg.learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.log_priors = np.zeros(self.num_pdfs, np.float32)
        self._step = jax.jit(self._train_step)

    def _train_step(self, params, batch_stats, opt_state, feats, targets,
                    mask):
        def loss_fn(p):
            logits, upd = self.model.apply(
                {"params": p, "batch_stats": batch_stats}, feats,
                train=True, mutable=["batch_stats"])
            lp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(lp, targets[..., None], axis=2)[..., 0]
            loss = jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(
                jnp.sum(mask), 1)
            acc = jnp.sum(jnp.where(
                mask, (jnp.argmax(logits, -1) == targets), 0)) / jnp.maximum(
                jnp.sum(mask), 1)
            return loss, (upd["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_bs, opt_state, \
            loss, acc

    def make_egs(self, feats: Dict[str, np.ndarray],
                 pdf_ali: Dict[str, np.ndarray]):
        C = self.cfg.chunk_size
        X, Y, M = [], [], []
        counts = np.zeros(self.num_pdfs)
        for u in sorted(feats):
            f = feats[u]
            a = np.asarray(pdf_ali[u])
            T = min(f.shape[0], len(a))
            counts += np.bincount(a[:T], minlength=self.num_pdfs)
            for s in range(0, T - C + 1, C):
                X.append(f[s:s + C])
                Y.append(a[s:s + C])
                M.append(np.ones(C, bool))
            rem = T % C
            if rem > C // 4:
                xf = np.zeros((C, f.shape[1]), f.dtype)
                xf[:rem] = f[T - rem:T]
                ya = np.zeros(C, np.int32)
                ya[:rem] = a[T - rem:T]
                m = np.zeros(C, bool)
                m[:rem] = True
                X.append(xf)
                Y.append(ya)
                M.append(m)
        # pdf priors from the alignment counts (nnet3-am-adjust-priors)
        priors = (counts + 0.5) / (counts.sum() + 0.5 * self.num_pdfs)
        self.log_priors = np.log(priors).astype(np.float32)
        return (np.stack(X).astype(np.float32),
                np.stack(Y).astype(np.int32), np.stack(M))

    def train(self, feats, pdf_ali) -> Dict[str, float]:
        X, Y, M = self.make_egs(feats, pdf_ali)
        N = X.shape[0]
        B = min(self.cfg.batch_size, N)
        rng = np.random.default_rng(0)
        out = {}
        for epoch in range(self.cfg.num_epochs):
            order = rng.permutation(N)
            for i in range(0, N - B + 1, B):
                idx = order[i:i + B]
                (self.params, self.batch_stats, self.opt_state, loss,
                 acc) = self._step(self.params, self.batch_stats,
                                   self.opt_state, jnp.asarray(X[idx]),
                                   jnp.asarray(Y[idx]), jnp.asarray(M[idx]))
            out = {"loss": float(loss), "frame_acc": float(acc)}
            if epoch % 5 == 0 or epoch == self.cfg.num_epochs - 1:
                log.info("xent epoch %d: loss %.4f acc %.3f", epoch,
                         out["loss"], out["frame_acc"])
        return out

    def loglikes_fn(self):
        """(T, D) → (T, P) pseudo-loglikes: log-softmax − log-priors."""
        model, params, bs = self.model, self.params, self.batch_stats
        log_priors = jnp.asarray(self.log_priors)

        @jax.jit
        def f(feats):
            logits = model.apply({"params": params, "batch_stats": bs},
                                 feats[None], train=False)[0]
            return jax.nn.log_softmax(logits) - log_priors[None, :]

        return f
