"""Batched exact Viterbi forced alignment on device.

Parity target: src/gmmbin/gmm-align-compiled.cc (FasterDecoder over a
per-utterance training graph).  Training graphs are tiny (linear
transcripts), so instead of beam-pruned token passing we run *exact*
dense Viterbi: the token set is ALL graph states, recombination is a
scatter-min over states, and a whole minibatch of utterances aligns in
one vmapped lax.scan — the TPU replacement for Kaldi's nj×utterance
process fan-out (SURVEY.md §2.4 data-parallel alignment).

Graphs are passed as padded dense (S, A) arc tensors (not closed-over
constants) so ONE compilation serves every utterance/iteration; pad
sizes are bucketed powers of two.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.fst.fst import EPS, VectorFst

log = get_logger(__name__)

BIG = jnp.float32(1e30)


@dataclasses.dataclass
class DenseGraph:
    """Padded dense arc tensors for one graph."""
    num_states: int
    start: int
    e_il: np.ndarray      # (S, Ae) int32, 0-padded
    e_ol: np.ndarray      # (S, Ae) int32 output labels
    e_w: np.ndarray       # (S, Ae) f32, BIG-padded
    e_ns: np.ndarray      # (S, Ae) int32
    n_ol: np.ndarray      # (S, An) int32 output labels
    n_w: np.ndarray       # (S, An) f32, BIG-padded
    n_ns: np.ndarray      # (S, An) int32
    final: np.ndarray     # (S,) f32
    eps_depth: int


def pack_dense(fst: VectorFst, s_pad: int, ae_pad: int, an_pad: int
               ) -> DenseGraph:
    from kaldi_tpu.fst.csr import _eps_depth
    S = fst.num_states
    if S > s_pad:
        raise KaldiError(f"pack_dense: {S} states > pad {s_pad}")
    e_il = np.zeros((s_pad, ae_pad), np.int32)
    e_ol = np.zeros((s_pad, ae_pad), np.int32)
    e_w = np.full((s_pad, ae_pad), 1e30, np.float32)
    e_ns = np.zeros((s_pad, ae_pad), np.int32)
    n_ol = np.zeros((s_pad, an_pad), np.int32)
    n_w = np.full((s_pad, an_pad), 1e30, np.float32)
    n_ns = np.zeros((s_pad, an_pad), np.int32)
    final = np.full(s_pad, 1e30, np.float32)
    n_off = np.zeros(S + 1, np.int64)
    n_ns_flat = []
    for s in range(S):
        ei = ni = 0
        n_off[s] = len(n_ns_flat)
        for a in fst.arcs[s]:
            if a.ilabel != EPS:
                if ei >= ae_pad:
                    raise KaldiError("pack_dense: emit degree overflow")
                e_il[s, ei] = a.ilabel
                e_ol[s, ei] = a.olabel
                e_w[s, ei] = a.weight
                e_ns[s, ei] = a.nextstate
                ei += 1
            else:
                if ni >= an_pad:
                    raise KaldiError("pack_dense: eps degree overflow")
                n_ol[s, ni] = a.olabel
                n_w[s, ni] = a.weight
                n_ns[s, ni] = a.nextstate
                ni += 1
                n_ns_flat.append(a.nextstate)
    n_off[S] = len(n_ns_flat)
    depth = _eps_depth(S, n_off, np.asarray(n_ns_flat, np.int64))
    for s, w in fst.finals.items():
        final[s] = w
    return DenseGraph(S, fst.start, e_il, e_ol, e_w, e_ns, n_ol, n_w,
                      n_ns, final, depth)


def degrees(fst: VectorFst) -> Tuple[int, int]:
    ae = an = 0
    for arcs in fst.arcs:
        e = sum(1 for a in arcs if a.ilabel != EPS)
        n = len(arcs) - e
        ae, an = max(ae, e), max(an, n)
    return ae, an


def _round_up(x: int, m: int = 8) -> int:
    return ((max(x, 1) + m - 1) // m) * m


class DenseAligner:
    """One jitted align function per (S_pad, Ae, An, E, T_pad) bucket."""

    def __init__(self, tid_to_pdf: np.ndarray, acoustic_scale: float = 1.0,
                 transition_eps_depth: int = 2):
        self.tid2pdf = jnp.asarray(tid_to_pdf, jnp.int32)
        self.acoustic_scale = acoustic_scale
        self._jits = {}

    # -- device code -------------------------------------------------------
    def _align_one(self, E: int, g, loglikes, num_frames):
        e_il, e_w, e_ns, n_w, n_ns, final, start = g
        S, Ae = e_il.shape

        def sweep(alpha, w, ns, il, loglike):
            # candidates (S, A): cost from each state via each arc slot
            if il is None:
                ac = 0.0
                tid = jnp.zeros_like(ns)
            else:
                tid = il
                ac = -self.acoustic_scale * loglike[self.tid2pdf[il]]
            cand = alpha[:, None] + w + ac
            cand = jnp.where(cand >= BIG, BIG, cand)
            flat_ns = ns.reshape(-1)
            flat_cost = cand.reshape(-1)
            nc = flat_cost.shape[0]
            dense = jnp.full((S,), BIG).at[flat_ns].min(flat_cost)
            is_win = flat_cost <= dense[flat_ns]
            winner = jnp.full((S,), nc, jnp.int32).at[flat_ns].min(
                jnp.where(is_win & (flat_cost < BIG),
                          jnp.arange(nc, dtype=jnp.int32), nc))
            wv = jnp.clip(winner, 0, nc - 1)
            A = w.shape[1]
            prev = jnp.where(winner < nc, (wv // A).astype(jnp.int32), -1)
            tids = jnp.where(winner < nc, tid.reshape(-1)[wv], 0)
            return dense, prev, tids

        def eps_union(alpha):
            """One ε sweep where states may also keep their current cost."""
            dense, prev, tids = sweep(alpha, n_w, n_ns, None, None)
            keep = alpha <= dense
            new_alpha = jnp.minimum(alpha, dense)
            idn = jnp.arange(S, dtype=jnp.int32)
            prev = jnp.where(keep, idn, prev)
            tids = jnp.where(keep, 0, tids)
            return new_alpha, prev, tids

        def frame_step(carry, xs):
            alpha = carry
            loglike, active = xs
            a1, prev_e, tid_e = sweep(alpha, e_w, e_ns, e_il, loglike)
            prevs, tidss = [prev_e], [tid_e]
            a = a1
            for _ in range(E):
                a, p, t = eps_union(a)
                prevs.append(p)
                tidss.append(t)
            idn = jnp.arange(S, dtype=jnp.int32)
            a = jnp.where(active, a, alpha)
            prevs = [jnp.where(active, p, idn) for p in prevs]
            tidss = [jnp.where(active, t, 0) for t in tidss]
            return a, (jnp.stack(prevs), jnp.stack(tidss))

        alpha0 = jnp.full((S,), BIG).at[start].set(0.0)
        for _ in range(E):
            alpha0, _, _ = eps_union(alpha0)
        T_pad = loglikes.shape[0]
        active = jnp.arange(T_pad) < num_frames
        alpha, (prev, tids) = jax.lax.scan(frame_step, alpha0,
                                           (loglikes, active))
        total = alpha + final
        best_state = jnp.argmin(total)
        return {"prev": prev, "tids": tids, "best_state": best_state,
                "best_cost": total[best_state]}

    # -- host API ----------------------------------------------------------
    def align_batch(self, graphs: Sequence[DenseGraph],
                    loglikes_list: Sequence[np.ndarray]
                    ) -> List[Tuple[List[int], float]]:
        """Align a batch; graphs are padded to a shared bucket here."""
        B = len(graphs)
        S = _round_up(max(g.e_il.shape[0] for g in graphs))
        Ae = max(g.e_il.shape[1] for g in graphs)
        An = max(g.n_w.shape[1] for g in graphs)
        E = max(g.eps_depth for g in graphs)
        T = _round_up(max(l.shape[0] for l in loglikes_list), 16)

        def pad_graph(g: DenseGraph):
            e_il = np.zeros((S, Ae), np.int32)
            e_il[:g.e_il.shape[0], :g.e_il.shape[1]] = g.e_il
            e_w = np.full((S, Ae), 1e30, np.float32)
            e_w[:g.e_w.shape[0], :g.e_w.shape[1]] = g.e_w
            e_ns = np.zeros((S, Ae), np.int32)
            e_ns[:g.e_ns.shape[0], :g.e_ns.shape[1]] = g.e_ns
            n_w = np.full((S, max(An, 1)), 1e30, np.float32)
            n_w[:g.n_w.shape[0], :g.n_w.shape[1]] = g.n_w
            n_ns = np.zeros((S, max(An, 1)), np.int32)
            n_ns[:g.n_ns.shape[0], :g.n_ns.shape[1]] = g.n_ns
            final = np.full(S, 1e30, np.float32)
            final[:len(g.final)] = g.final
            return (e_il, e_w, e_ns, n_w, n_ns, final,
                    np.int32(g.start))

        P = loglikes_list[0].shape[1]
        lls = np.zeros((B, T, P), np.float32)
        lens = np.zeros(B, np.int32)
        for b, l in enumerate(loglikes_list):
            lls[b, :l.shape[0]] = l
            lens[b] = l.shape[0]
        batch = [pad_graph(g) for g in graphs]
        stacked = tuple(np.stack([bg[i] for bg in batch]) for i in range(7))

        key = (S, Ae, max(An, 1), E, T, P)
        if key not in self._jits:
            fn = partial(self._align_one, E)
            self._jits[key] = jax.jit(jax.vmap(
                lambda g, ll, n: fn(g, ll, n)))
            log.info("DenseAligner: compiling bucket %s", key)
        out = self._jits[key](tuple(jnp.asarray(x) for x in stacked),
                              jnp.asarray(lls), jnp.asarray(lens))
        out = jax.tree_util.tree_map(np.asarray, out)

        results = []
        for b in range(B):
            T_b = int(lens[b])
            cost = float(out["best_cost"][b])
            if cost >= 1e29:
                raise KaldiError(f"align: no path for utterance {b}")
            idx = int(out["best_state"][b])
            E1 = out["prev"].shape[2]
            rev: List[int] = []
            for t in range(T_b - 1, -1, -1):
                for e in range(E1 - 1, -1, -1):
                    tid = int(out["tids"][b, t, e, idx])
                    if tid != 0:
                        rev.append(tid)
                    idx = int(out["prev"][b, t, e, idx])
                    if idx < 0:
                        raise KaldiError("align: broken backpointer")
            rev.reverse()
            results.append((rev, cost))
        return results
