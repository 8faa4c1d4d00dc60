"""LF-MMI ('chain') training objective.

Parity targets: src/chain/chain-training.h (ComputeChainObjfAndDeriv),
chain-den-graph.h (DenominatorGraph), chain-denominator.h
(DenominatorComputation), chain-supervision.h (Supervision).

TPU-first design: the denominator forward recursion is a log-space
lax.scan over frames with per-arc gathers and segment-logsumexp
recombination; gradients (the forward-backward posteriors) come from
jax.grad differentiating through the forward pass — d logZ / d score =
expected occupancy, so XLA's autodiff *is* the backward pass of
chain-kernels.cu, with jax.checkpoint rematerializing alpha instead of
storing T×S betas.

The numerator here is the fixed forced-alignment path at the
subsampled frame rate (the reference's Supervision FSTs additionally
allow a ±frame tolerance window; hook `numerator_fst_logprob` takes a
path FST so tolerance supervisions can plug in).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.tree import ContextDependency

log = get_logger(__name__)


@dataclasses.dataclass
class DenominatorGraph:
    """Flat arc-list HMM over pdf-ids (chain-den-graph.h equivalent)."""
    num_states: int
    src: np.ndarray        # (A,) int32
    dst: np.ndarray        # (A,) int32
    pdf: np.ndarray        # (A,) int32
    logw: np.ndarray       # (A,) f32
    initial: np.ndarray    # (S,) f32 log initial probs
    final: np.ndarray      # (S,) f32 log final probs


def make_denominator_graph(phone_seqs: Sequence[Sequence[int]],
                           tree: ContextDependency,
                           topo: HmmTopology,
                           interp: float = 1e-3) -> DenominatorGraph:
    """Build the den graph from training phone sequences: a bigram phone
    LM (chain recipes estimate it from the numerator alignments —
    chain-est-phone-lm) expanded through the chain 2-state topology.

    State p = 'inside phone p'; arcs carry the *forward* pdf of the
    destination phone; self-loops carry the self-loop pdf.
    """
    phones = sorted(topo.phones)
    pidx = {p: i for i, p in enumerate(phones)}
    P = len(phones)
    # bigram counts with +interp smoothing over all pairs
    uni = np.full(P, interp)
    big = np.full((P, P), interp)
    fin = np.full(P, interp)
    for seq in phone_seqs:
        if not seq:
            continue
        uni[pidx[seq[0]]] += 1
        for a, b in zip(seq[:-1], seq[1:]):
            big[pidx[a], pidx[b]] += 1
        fin[pidx[seq[-1]]] += 1

    def pdfs_of(phone):
        window = [0] * tree.context_width
        window[tree.central_position] = phone
        entry = topo.topology_for_phone(phone)
        st = entry[0]
        return (tree.compute(window, st.forward_pdf_class),
                tree.compute(window, st.self_loop_pdf_class))

    # transition probs of the chain topo state (0.5 / 0.5 by default)
    def topo_probs(phone):
        entry = topo.topology_for_phone(phone)
        trans = entry[0].transitions
        p_self = sum(p for ns, p in trans if ns == 0)
        p_fwd = sum(p for ns, p in trans if ns != 0)
        return math.log(max(p_self, 1e-10)), math.log(max(p_fwd, 1e-10))

    src, dst, pdf, logw = [], [], [], []
    # normalize LM rows including the final "phone ends utterance" mass
    row_tot = big.sum(axis=1) + fin
    for a in range(P):
        l_self, l_fwd = topo_probs(phones[a])
        fwd_a, slf_a = pdfs_of(phones[a])
        # self-loop of phone a
        src.append(a)
        dst.append(a)
        pdf.append(slf_a)
        logw.append(l_self)
        for b in range(P):
            fwd_b, _ = pdfs_of(phones[b])
            w = l_fwd + math.log(big[a, b] / row_tot[a])
            src.append(a)
            dst.append(b)
            pdf.append(fwd_b)
            logw.append(w)

    # initial: entering phone p emits its forward pdf on the first frame;
    # we model that by initial probs over states combined with emitting
    # the state's OWN pdf at every frame including the first. To keep the
    # per-frame recursion uniform, fold entry emission as: alpha_0[p] =
    # log uni[p]; frame emissions use self-loop pdfs; approximation noted.
    # Better: add a super-initial expansion on frame 0 handled in the
    # forward function via `initial` probs + first-frame forward pdfs.
    initial = np.log(uni / uni.sum())
    final = np.log(fin / row_tot)
    return DenominatorGraph(
        num_states=P,
        src=np.asarray(src, np.int32),
        dst=np.asarray(dst, np.int32),
        pdf=np.asarray(pdf, np.int32),
        logw=np.asarray(logw, np.float32),
        initial=initial.astype(np.float32),
        final=final.astype(np.float32),
    )


def _segment_logsumexp(vals: jnp.ndarray, segs: jnp.ndarray,
                       num_segments: int) -> jnp.ndarray:
    """logsumexp of vals grouped by segs along the last axis.
    vals: (..., A); segs: (A,). Returns (..., num_segments)."""
    NEG = jnp.float32(-1e30)
    mx = jnp.full(vals.shape[:-1] + (num_segments,), NEG)
    mx = mx.at[..., segs].max(vals)
    mx_g = mx[..., segs]
    s = jnp.zeros(vals.shape[:-1] + (num_segments,))
    s = s.at[..., segs].add(jnp.exp(vals - mx_g))
    return mx + jnp.log(jnp.maximum(s, 1e-30))


def denominator_logprob(den: DenominatorGraph, scores: jnp.ndarray
                        ) -> jnp.ndarray:
    """log Z of the denominator HMM for each sequence.

    scores: (B, T, num_pdfs) un-normalized log acoustic scores.
    Returns (B,) log-probs.  Differentiable; wrap calls in jax.value_and_grad.
    """
    S = den.num_states
    src = jnp.asarray(den.src)
    dst = jnp.asarray(den.dst)
    pdf = jnp.asarray(den.pdf)
    logw = jnp.asarray(den.logw)
    initial = jnp.asarray(den.initial)
    final = jnp.asarray(den.final)

    B, T, _ = scores.shape

    # Frame 0: a chunk may start mid-phone (state p continuing → emits
    # p's self-loop pdf) OR at a phone start (entering p → emits p's
    # forward/entry pdf).  Both options must be in the denominator or the
    # numerator's chunk-start forward pdfs escape normalization and the
    # objective grows without bound.
    self_pdf = np.zeros(S, np.int32)
    entry_pdf = np.zeros(S, np.int32)
    best_w = np.full(S, -np.inf)
    for a in range(len(den.src)):
        s, d = den.src[a], den.dst[a]
        if s == d and den.logw[a] > best_w[s]:
            best_w[s] = den.logw[a]
            self_pdf[s] = den.pdf[a]
        if s != d:
            entry_pdf[d] = den.pdf[a]   # all entry arcs into d share d's fwd pdf
    self_pdf = jnp.asarray(self_pdf)
    entry_pdf = jnp.asarray(entry_pdf)

    alpha0 = initial[None, :] + jnp.logaddexp(
        scores[:, 0, :][:, self_pdf], scores[:, 0, :][:, entry_pdf])  # (B, S)

    @jax.checkpoint
    def step(alpha, score_t):
        contrib = alpha[:, src] + logw[None, :] + score_t[:, pdf]
        new_alpha = _segment_logsumexp(contrib, dst, S)
        # normalize for numerical stability; carry the log-correction
        m = jnp.max(new_alpha, axis=1, keepdims=True)
        return new_alpha - m, m[:, 0]

    def scan_step(carry, score_t):
        alpha, corr = carry
        new_alpha, m = step(alpha, score_t)
        return (new_alpha, corr + m), None

    (alphaT, corr), _ = jax.lax.scan(
        scan_step, (alpha0, jnp.zeros(B)),
        jnp.swapaxes(scores[:, 1:, :], 0, 1))
    return corr + jax.scipy.special.logsumexp(alphaT + final[None, :], axis=1)


def numerator_logprob(scores: jnp.ndarray, pdf_ali: jnp.ndarray,
                      mask: jnp.ndarray) -> jnp.ndarray:
    """Fixed-path numerator: Σ_t scores[t, pdf_ali[t]] over valid frames.
    scores: (B, T, P); pdf_ali: (B, T) int32; mask: (B, T) bool."""
    B, T, P = scores.shape
    gathered = jnp.take_along_axis(
        scores, pdf_ali[..., None].astype(jnp.int32), axis=2)[..., 0]
    return jnp.sum(jnp.where(mask, gathered, 0.0), axis=1)


def numerator_flexible_logprob(scores: jnp.ndarray,
                               entry_pdf: jnp.ndarray,
                               self_pdf: jnp.ndarray,
                               num_segs: jnp.ndarray,
                               mask: jnp.ndarray) -> jnp.ndarray:
    """Supervision-FST numerator with FREE phone-boundary placement
    (a superset of chain-supervision.h's ±tolerance window): the chunk's
    phone-segment sequence is fixed, but frames distribute over segments
    arbitrarily (each segment ≥ 1 frame).

    The supervision graph is a linear chain over segments, so the
    forward recursion is shift + logaddexp — no gathers:

        α'[s] = logaddexp(α[s] + score[self_pdf[s]],
                          α[s−1] + score[entry_pdf[s]])

    scores (B, T, P); entry_pdf/self_pdf (B, S) padded; num_segs (B,);
    mask (B, T).  Frame 0 admits entry OR continuation of segment 0
    (chunks may start mid-phone).  Returns (B,) log-probs.
    """
    B, T, P = scores.shape
    S = entry_pdf.shape[1]
    NEG = jnp.float32(-1e30)

    def gather(score_t, pdfs):
        return jnp.take_along_axis(score_t, pdfs, axis=1)  # (B, S)

    s0 = scores[:, 0, :]
    alpha0 = jnp.full((B, S), NEG).at[:, 0].set(
        jnp.logaddexp(gather(s0, entry_pdf)[:, 0],
                      gather(s0, self_pdf)[:, 0]))

    def step(alpha, xs):
        score_t, act = xs
        stay = alpha + gather(score_t, self_pdf)
        shifted = jnp.concatenate(
            [jnp.full((B, 1), NEG), alpha[:, :-1]], axis=1)
        advance = shifted + gather(score_t, entry_pdf)
        new = jnp.logaddexp(stay, advance)
        new = jnp.where(act[:, None], new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(
        step, alpha0,
        (jnp.swapaxes(scores[:, 1:, :], 0, 1), jnp.swapaxes(mask[:, 1:], 0, 1)))
    # end in the LAST segment (it may continue past the chunk edge)
    last = jnp.clip(num_segs - 1, 0, S - 1)
    return jnp.take_along_axis(alpha, last[:, None].astype(jnp.int32),
                               axis=1)[:, 0]


@dataclasses.dataclass
class ChainTrainingOptions:
    """Mirrors chain-training.h ChainTrainingOptions names."""
    l2_regularize: float = 5e-5
    leaky_hmm_coefficient: float = 0.1    # reserved (see denominator init)
    xent_regularize: float = 0.0


def chain_objf(den: DenominatorGraph, scores: jnp.ndarray,
               pdf_ali: jnp.ndarray, mask: jnp.ndarray,
               opts: ChainTrainingOptions = ChainTrainingOptions(),
               num_graph: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]] = None
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Negative LF-MMI objective per frame (to minimize) + diagnostics.

    num_graph = (entry_pdf, self_pdf, num_segs) switches the numerator
    to the flexible-boundary supervision FST; pdf_ali is ignored then."""
    if num_graph is not None:
        num = numerator_flexible_logprob(scores, num_graph[0], num_graph[1],
                                         num_graph[2], mask)
    else:
        num = numerator_logprob(scores, pdf_ali, mask)
    den_lp = denominator_logprob(den, scores)
    num_frames = jnp.maximum(jnp.sum(mask), 1)
    objf = (jnp.sum(num) - jnp.sum(den_lp)) / num_frames
    loss = -objf
    if opts.l2_regularize > 0:
        loss = loss + opts.l2_regularize * jnp.mean(scores ** 2)
    return loss, {"objf": objf, "num": jnp.sum(num) / num_frames,
                  "den": jnp.sum(den_lp) / num_frames}
