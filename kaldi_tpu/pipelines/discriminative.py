"""Discriminative (sequence) fine-tuning of a trained NN acoustic
model: MMI or sMBR over decoder-generated denominator lattices.

Parity target: the nnet3 discriminative-training flow
(steps/nnet3/get_degs.sh + nnet3-discriminative-train: decode training
data with a weak LM → den lattices; numerator = forced alignment;
a few epochs of sequence-objective updates at a small lr) and nnet1's
sMBR recipe (steps/nnet/train_mpe.sh).

The lattices are generated ONCE with the starting model (matching the
reference, which fixes degs for all iterations) and converted to the
dense time-synchronous form of am/discriminative.py; each update is
jitted per (T, A, K) shape — callers group utterances of equal length
(the synthetic corpora here are already length-homogeneous; bucketing
pads A/K only, which masks cleanly).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from kaldi_tpu.am.discriminative import (DenseLattice, frame_accuracy,
                                         den_lattice_from_decoder,
                                         mmi_objf, smbr_objf)
from kaldi_tpu.core.logging import get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class DiscriminativeConfig:
    criterion: str = "smbr"           # "smbr" | "mmi"
    num_epochs: int = 4
    learning_rate: float = 5e-5
    acoustic_scale: float = 0.1


def make_degs(decoder, scores: Dict[str, np.ndarray]
              ) -> Dict[str, DenseLattice]:
    """Denominator lattices for every utterance from the CURRENT model
    scores (get_degs.sh role).  Shapes (A, K) are padded to the corpus
    max so equal-length utterances share one compiled update."""
    lats = {u: den_lattice_from_decoder(decoder, s)
            for u, s in scores.items()}
    A = max(l.src.shape[1] for l in lats.values())
    K = max(l.K for l in lats.values())

    def pad(l: DenseLattice) -> DenseLattice:
        T, a = l.src.shape

        def pa(x, fill=0):
            out = np.full((T, A), fill, x.dtype)
            out[:, :a] = x
            return out

        final = np.full(K, -1e30, np.float32)
        final[:l.K] = l.final
        ns = np.zeros(K, np.int32)
        return DenseLattice(src=pa(l.src), dst=pa(l.dst), pdf=pa(l.pdf),
                            w=pa(l.w), mask=pa(l.mask), final=final,
                            num_states=l.num_states)

    return {u: pad(l) for u, l in lats.items()}


def discriminative_finetune(trainer, decoder, feats: Dict[str, np.ndarray],
                            num_ali: Dict[str, np.ndarray],
                            cfg: DiscriminativeConfig = None,
                            pdf_to_phone: Optional[np.ndarray] = None):
    """Fine-tune `trainer` (an XentTrainer-like object exposing
    .model/.params/.batch_stats and .scores_fn()) on its own decode
    lattices.  num_ali maps utt → per-frame pdf alignment.  Returns a
    dict of per-epoch mean objective values."""
    cfg = cfg or DiscriminativeConfig()
    scorer = trainer.loglikes_fn()
    scores0 = {u: np.asarray(scorer(jnp.asarray(feats[u])))
               for u in feats}
    degs = make_degs(decoder, scores0)
    accs = {u: jnp.asarray(frame_accuracy(degs[u], num_ali[u],
                                          pdf_to_phone))
            for u in feats} if cfg.criterion == "smbr" else {}

    tx = optax.adam(cfg.learning_rate)
    params = trainer.params
    opt_state = tx.init(params)
    bs = trainer.batch_stats
    kappa = cfg.acoustic_scale

    log_priors = jnp.asarray(trainer.log_priors)

    def objf_fn(p, x, num, acc, lat):
        logits = trainer.model.apply(
            {"params": p, "batch_stats": bs}, x[None],
            train=False)[0]
        # same pseudo-loglikes the decoder consumed (log-softmax −
        # log-priors), so lattice and objective scores agree
        scores = jax.nn.log_softmax(logits) - log_priors[None, :]
        if cfg.criterion == "mmi":
            return -mmi_objf(lat, scores, num, kappa)
        return -smbr_objf(lat, scores, acc, kappa)

    @jax.jit
    def step(p, os, x, num, acc, src, dst, pdfm, w, mask, final):
        # the lattice rides in as traced arrays so one compilation per
        # (T, A, K) shape serves every utterance of that shape
        lat = DenseLattice(src=src, dst=dst, pdf=pdfm, w=w, mask=mask,
                           final=final, num_states=None)
        loss, g = jax.value_and_grad(objf_fn)(p, x, num, acc, lat)
        upd, os = tx.update(g, os)
        return optax.apply_updates(p, upd), os, -loss

    hist = []
    for ep in range(cfg.num_epochs):
        tot, n = 0.0, 0
        for u in sorted(feats):
            lat = degs[u]
            acc = accs.get(u, jnp.zeros((lat.T, lat.src.shape[1])))
            params, opt_state, objf = step(
                params, opt_state, jnp.asarray(feats[u], jnp.float32),
                jnp.asarray(num_ali[u][:lat.T]), acc,
                jnp.asarray(lat.src), jnp.asarray(lat.dst),
                jnp.asarray(lat.pdf), jnp.asarray(lat.w),
                jnp.asarray(lat.mask), jnp.asarray(lat.final))
            tot += float(objf)
            n += 1
        hist.append(tot / max(n, 1))
        log.info("discriminative %s epoch %d: objf/utt %.4f",
                 cfg.criterion, ep, hist[-1])
    trainer.params = params
    return {"objf": hist}
