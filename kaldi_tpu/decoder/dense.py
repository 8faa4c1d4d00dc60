"""Dense gather-based Viterbi beam decoder (the TPU fast path).

The scatter-min recombination in decoder/beam.py lowers to serialized
scatters on TPU (~10 ms/frame).  This decoder reformulates token
recombination as a GATHER: arcs are packed by *destination* state
(reverse adjacency, padded to the max in-degree), so

    alpha'[s] = min over incoming arcs a of
                alpha[src(a)] + w(a) − scale·loglike[pdf(ilabel(a))]

is a dense (S, Ain) gather + min-reduce — pure VPU work, no scatters,
no sorts, no top-k.  Beam pruning is a vector mask against the frame
minimum.  This is exact Viterbi over the whole state space (max-active
= S), the right regime for small/medium graphs where dense per-state
arrays fit comfortably in HBM; the token-list decoder in beam.py
remains for graphs too large to keep dense.

Per-frame backpointers store the winning in-arc slot (one int8/int16
if Ain < 128, int32 here for simplicity) per state per ε-sweep.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.fst.fst import EPS, VectorFst

log = get_logger(__name__)

BIG = jnp.float32(1e30)


@dataclasses.dataclass
class ReverseDenseGraph:
    """Arcs grouped by destination, padded to max in-degree."""
    num_states: int
    start: int
    # emitting in-arcs: (S, Ae)
    e_src: np.ndarray
    e_il: np.ndarray
    e_ol: np.ndarray
    e_w: np.ndarray
    # epsilon in-arcs: (S, An)
    n_src: np.ndarray
    n_ol: np.ndarray
    n_w: np.ndarray
    final: np.ndarray          # (S,)
    eps_depth: int

    @property
    def max_in_emit(self) -> int:
        return self.e_src.shape[1]


def pack_reverse(fst: VectorFst) -> ReverseDenseGraph:
    from kaldi_tpu.fst.csr import _eps_depth
    S = fst.num_states
    if S == 0 or fst.start < 0:
        raise KaldiError("pack_reverse: empty FST")
    e_in: List[List[tuple]] = [[] for _ in range(S)]
    n_in: List[List[tuple]] = [[] for _ in range(S)]
    n_off = np.zeros(S + 1, np.int64)
    n_flat: List[int] = []
    for s in range(S):
        n_off[s] = len(n_flat)
        for a in fst.arcs[s]:
            if a.ilabel != EPS:
                e_in[a.nextstate].append((s, a.ilabel, a.olabel, a.weight))
            else:
                n_in[a.nextstate].append((s, a.olabel, a.weight))
                n_flat.append(a.nextstate)
    n_off[S] = len(n_flat)
    depth = _eps_depth(S, n_off, np.asarray(n_flat, np.int64))

    Ae = max(1, max(len(x) for x in e_in))
    An = max(1, max(len(x) for x in n_in))
    e_src = np.zeros((S, Ae), np.int32)
    e_il = np.zeros((S, Ae), np.int32)
    e_ol = np.zeros((S, Ae), np.int32)
    e_w = np.full((S, Ae), 1e30, np.float32)
    n_src = np.zeros((S, An), np.int32)
    n_ol = np.zeros((S, An), np.int32)
    n_w = np.full((S, An), 1e30, np.float32)
    for s in range(S):
        for i, (src, il, ol, w) in enumerate(e_in[s]):
            e_src[s, i] = src
            e_il[s, i] = il
            e_ol[s, i] = ol
            e_w[s, i] = w
        for i, (src, ol, w) in enumerate(n_in[s]):
            n_src[s, i] = src
            n_ol[s, i] = ol
            n_w[s, i] = w
    final = np.full(S, 1e30, np.float32)
    for s, w in fst.finals.items():
        final[s] = w
    return ReverseDenseGraph(S, fst.start, e_src, e_il, e_ol, e_w,
                             n_src, n_ol, n_w, final, depth)


@dataclasses.dataclass
class DenseDecoderConfig:
    beam: float = 16.0
    acoustic_scale: float = 0.1


class DenseDecoder:
    """Exact dense Viterbi with beam masking; batch via vmap."""

    def __init__(self, graph: ReverseDenseGraph, tid_to_pdf: np.ndarray,
                 config: DenseDecoderConfig = None):
        self.graph = graph
        self.config = config or DenseDecoderConfig()
        g = graph
        self.c = dict(
            e_src=jnp.asarray(g.e_src), e_il=jnp.asarray(g.e_il),
            e_w=jnp.asarray(g.e_w),
            n_src=jnp.asarray(g.n_src), n_w=jnp.asarray(g.n_w),
            final=jnp.asarray(g.final),
            e_pdf=jnp.asarray(tid_to_pdf, jnp.int32)[jnp.asarray(g.e_il)],
        )
        self._jit_one = jax.jit(self._decode_scan)
        self._jit_batch = jax.jit(jax.vmap(self._decode_scan,
                                           in_axes=(0, 0)))

    def _decode_scan(self, loglikes, num_frames):
        c = self.c
        S = self.graph.num_states
        E = self.graph.eps_depth
        beam = self.config.beam
        scale = self.config.acoustic_scale

        def eps_sweep(alpha):
            cand = alpha[c["n_src"]] + c["n_w"]            # (S, An)
            best = jnp.min(cand, axis=1)
            arg = jnp.argmin(cand, axis=1).astype(jnp.int32)
            keep = alpha <= best
            new = jnp.minimum(alpha, best)
            return new, jnp.where(keep, -1, arg)           # -1 = kept own

        def frame_step(alpha, xs):
            loglike, active = xs
            ac = -scale * loglike[c["e_pdf"]]              # (S, Ae)
            cand = alpha[c["e_src"]] + c["e_w"] + ac
            new = jnp.min(cand, axis=1)
            bp_e = jnp.argmin(cand, axis=1).astype(jnp.int32)
            # beam prune
            m = jnp.min(new)
            new = jnp.where(new > m + beam, BIG, new)
            bps = [bp_e]
            for _ in range(E):
                new, bp = eps_sweep(new)
                bps.append(bp)
            new = jnp.where(active, new, alpha)
            bps = [jnp.where(active, b, -1) for b in bps]
            return new, jnp.stack(bps)                     # (E+1, S)

        alpha0 = jnp.full((S,), BIG).at[self.graph.start].set(0.0)
        init_bps = []
        for _ in range(E):
            alpha0, bp = eps_sweep(alpha0)
            init_bps.append(bp)
        init_bps = (jnp.stack(init_bps) if init_bps
                    else jnp.zeros((0, S), jnp.int32))
        T_pad = loglikes.shape[0]
        active = jnp.arange(T_pad) < num_frames
        alpha, bps = jax.lax.scan(frame_step, alpha0, (loglikes, active))
        total = alpha + c["final"]
        has_final = jnp.min(total) < BIG
        use = jnp.where(has_final, total, alpha)
        best_state = jnp.argmin(use)
        return {"bps": bps, "init_bps": init_bps, "best_state": best_state,
                "best_cost": use[best_state]}

    # -- host API ----------------------------------------------------------
    def decode(self, loglikes: np.ndarray):
        T = loglikes.shape[0]
        out = self._jit_one(jnp.asarray(loglikes, jnp.float32), jnp.int32(T))
        return self._backtrace(jax.tree_util.tree_map(np.asarray, out), T)

    def decode_batch(self, loglikes_padded, num_frames):
        out = self._jit_batch(jnp.asarray(loglikes_padded, jnp.float32),
                              jnp.asarray(num_frames, jnp.int32))
        out = jax.tree_util.tree_map(np.asarray, out)
        return [self._backtrace(
            jax.tree_util.tree_map(lambda x: x[b], out),
            int(num_frames[b])) for b in range(loglikes_padded.shape[0])]

    def _backtrace(self, out, T: int):
        g = self.graph
        cost = float(out["best_cost"])
        if cost >= 1e29:
            raise KaldiError("DenseDecoder: no path")
        s = int(out["best_state"])
        E1 = out["bps"].shape[1]
        rev_tids: List[int] = []
        rev_ols: List[int] = []
        for t in range(T - 1, -1, -1):
            # ε sweeps in reverse order, then the emitting step
            for e in range(E1 - 1, 0, -1):
                slot = int(out["bps"][t, e, s])
                if slot >= 0:
                    ol = int(g.n_ol[s, slot])
                    if ol:
                        rev_ols.append(ol)
                    s = int(g.n_src[s, slot])
            slot = int(out["bps"][t, 0, s])
            if slot < 0:
                raise KaldiError("DenseDecoder: broken backpointer")
            tid = int(g.e_il[s, slot])
            ol = int(g.e_ol[s, slot])
            if ol:
                rev_ols.append(ol)
            rev_tids.append(tid)
            s = int(g.e_src[s, slot])
        # initial ε-closure moves before frame 0
        for e in range(out["init_bps"].shape[0] - 1, -1, -1):
            slot = int(out["init_bps"][e, s])
            if slot >= 0:
                ol = int(g.n_ol[s, slot])
                if ol:
                    rev_ols.append(ol)
                s = int(g.n_src[s, slot])
        rev_tids.reverse()
        rev_ols.reverse()
        return rev_tids, rev_ols, cost
