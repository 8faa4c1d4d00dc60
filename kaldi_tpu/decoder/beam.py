"""Vectorized token-passing Viterbi beam decoder for TPU.

Parity target: src/decoder/lattice-faster-decoder.h
(LatticeFasterDecoderTpl::{ProcessEmitting, ProcessNonemitting,
GetBestPath}, LatticeFasterDecoderConfig{beam, max_active}) and the
fork's GPU decoder (arXiv:1804.03243: per-frame parallel arc expansion
with atomic-min token recombination).

TPU-first design (SURVEY.md §7.4): TPUs have no atomics, so
recombination uses dense scatter-min over graph states instead of the
CUDA decoder's packed 64-bit atomicMin:

  per frame (one lax.scan step, fully data-independent control flow):
    1. expand   — active tokens (K,) gather their out-arc ranges from
                  the CSR graph → (K, A) padded candidate matrix;
                  cost = tok_cost + graph_w − scale·loglike[pdf[tid]]
    2. prune    — beam mask vs the running best candidate
    3. recombine— segment-min into a dense (S,) per-state best-cost
                  array + winner index (two segment_mins)
    4. top-K    — max-active selection over the dense array → new (K,)
                  token set (adaptive beam via top_k, replacing
                  GetCutoff's histogram)
    5. ε-sweeps — eps_depth repetitions of 1–4 over the ε-CSR (the
                  graph's ε-DAG depth is measured at pack time, so the
                  closure is a fixed unrolled loop, not a priority queue)

Backpointers (prev-token index, tid, olabel) are emitted per sweep per
frame; best-path backtrace runs on host after the scan.  Batching over
utterances is a vmap over the whole scan with per-utterance frame masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.fst.csr import CsrGraph

log = get_logger(__name__)

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class BeamDecoderConfig:
    """Mirrors LatticeFasterDecoderConfig option names."""
    beam: float = 16.0
    max_active: int = 512          # K: token capacity (power of 2 helps)
    acoustic_scale: float = 0.1
    # lattice_beam / prune_interval arrive with lattice generation


class BeamDecoder:
    """Compiled decoder bound to one graph (the graph arrays live in HBM
    once; every decode reuses them — mirroring CudaFst residency)."""

    def __init__(self, graph: CsrGraph, tid_to_pdf: np.ndarray,
                 config: BeamDecoderConfig = None):
        self.graph = graph
        self.config = config or BeamDecoderConfig()
        # K may not exceed the state count (top_k over the dense per-state
        # array requires K <= S).
        self.K = max(1, min(self.config.max_active, graph.num_states))
        self.g = {
            "e_off": jnp.asarray(graph.e_offsets, jnp.int32),
            "e_il": jnp.asarray(graph.e_ilabel, jnp.int32),
            "e_ol": jnp.asarray(graph.e_olabel, jnp.int32),
            "e_w": jnp.asarray(graph.e_weight, jnp.float32),
            "e_ns": jnp.asarray(graph.e_nextstate, jnp.int32),
            "n_off": jnp.asarray(graph.n_offsets, jnp.int32),
            "n_ol": jnp.asarray(graph.n_olabel, jnp.int32),
            "n_w": jnp.asarray(graph.n_weight, jnp.float32),
            "n_ns": jnp.asarray(graph.n_nextstate, jnp.int32),
            "final": jnp.asarray(graph.final_costs, jnp.float32),
            "tid2pdf": jnp.asarray(tid_to_pdf, jnp.int32),
        }
        self._decode_jit = jax.jit(self._decode_scan)
        self._decode_batch_jit = jax.jit(
            jax.vmap(self._decode_scan, in_axes=(0, 0)))

    # ------------------------------------------------------------------
    # device-side pieces
    # ------------------------------------------------------------------

    def _expand_recombine(self, tok_state, tok_cost, use_eps: bool,
                          loglike=None):
        """One expand→prune→recombine→top-K sweep.

        Returns (new_state (K,), new_cost (K,), prev_idx (K,), tid (K,),
        olabel (K,)) — prev_idx = -1 marks empty slots; for ε-sweeps a
        surviving unchanged token points at itself with tid = olabel = 0.
        """
        g = self.g
        K = self.K
        S = self.graph.num_states
        A = (self.graph.max_eps_degree if use_eps
             else self.graph.max_emit_degree)
        A = max(A, 1)
        off = g["n_off"] if use_eps else g["e_off"]
        ns_arr = g["n_ns"] if use_eps else g["e_ns"]
        w_arr = g["n_w"] if use_eps else g["e_w"]
        ol_arr = g["n_ol"] if use_eps else g["e_ol"]

        valid_tok = tok_state >= 0
        safe_state = jnp.where(valid_tok, tok_state, 0)
        base = off[safe_state]                              # (K,)
        count = off[safe_state + 1] - base
        aidx = base[:, None] + jnp.arange(A, dtype=jnp.int32)[None, :]
        amask = (jnp.arange(A)[None, :] < count[:, None]) & valid_tok[:, None]
        aidx = jnp.clip(aidx, 0, max(len(w_arr) - 1, 0))

        ns = ns_arr[aidx]                                   # (K, A)
        w = w_arr[aidx]
        ol = ol_arr[aidx]
        if use_eps:
            il = jnp.zeros_like(ns)
            ac = 0.0
        else:
            il = g["e_il"][aidx]
            ac = -self.config.acoustic_scale * loglike[g["tid2pdf"][il]]
        cost = jnp.where(amask, tok_cost[:, None] + w + ac, INF)

        # flatten candidates; for ε-sweeps, existing tokens are also
        # candidates for their own state (they may survive unchanged).
        c_state = ns.reshape(-1)
        c_cost = cost.reshape(-1)
        c_prev = jnp.repeat(jnp.arange(K, dtype=jnp.int32), A)
        c_tid = il.reshape(-1)
        c_ol = ol.reshape(-1)
        if use_eps:
            c_state = jnp.concatenate([c_state, safe_state])
            c_cost = jnp.concatenate([c_cost, jnp.where(valid_tok, tok_cost, INF)])
            c_prev = jnp.concatenate([c_prev, jnp.arange(K, dtype=jnp.int32)])
            c_tid = jnp.concatenate([c_tid, jnp.zeros(K, jnp.int32)])
            c_ol = jnp.concatenate([c_ol, jnp.zeros(K, jnp.int32)])

        # beam prune against the running best
        best = jnp.min(c_cost)
        c_cost = jnp.where(c_cost > best + self.config.beam, INF, c_cost)
        c_state = jnp.where(jnp.isfinite(c_cost), c_state, 0)

        # dense recombination: per-state min cost, then winning candidate
        dense = jnp.full((S,), INF).at[c_state].min(
            jnp.where(jnp.isfinite(c_cost), c_cost, INF))
        is_winner = jnp.isfinite(c_cost) & (c_cost <= dense[c_state])
        ncand = c_cost.shape[0]
        winner = jnp.full((S,), ncand, jnp.int32).at[c_state].min(
            jnp.where(is_winner, jnp.arange(ncand, dtype=jnp.int32), ncand))

        # top-K states by cost (max-active)
        neg, states = jax.lax.top_k(-dense, K)
        new_cost = -neg
        ok = jnp.isfinite(new_cost)
        new_state = jnp.where(ok, states, -1).astype(jnp.int32)
        widx = winner[jnp.where(ok, states, 0)]
        widx = jnp.clip(widx, 0, ncand - 1)
        prev_idx = jnp.where(ok, c_prev[widx], -1).astype(jnp.int32)
        tid = jnp.where(ok, c_tid[widx], 0)
        olab = jnp.where(ok, c_ol[widx], 0)
        return new_state, new_cost, prev_idx, tid, olab

    def _frame_step(self, carry, xs):
        tok_state, tok_cost = carry
        loglike, active = xs          # active: bool, frame < utt length
        E = self.graph.eps_depth
        records = []
        s, c, p, t, o = self._expand_recombine(tok_state, tok_cost, False,
                                               loglike)
        records.append((p, t, o))
        for _ in range(E):
            s, c, p, t, o = self._expand_recombine(s, c, True)
            records.append((p, t, o))
        # identity step for padded frames
        idn = jnp.arange(self.K, dtype=jnp.int32)
        s = jnp.where(active, s, tok_state)
        c = jnp.where(active, c, tok_cost)
        out = []
        for (p, t, o) in records:
            out.append((jnp.where(active, p, idn),
                        jnp.where(active, t, 0),
                        jnp.where(active, o, 0)))
        prev = jnp.stack([r[0] for r in out])    # (E+1, K)
        tids = jnp.stack([r[1] for r in out])
        ols = jnp.stack([r[2] for r in out])
        return (s, c), (prev, tids, ols)

    def _decode_scan(self, loglikes, num_frames):
        """loglikes: (T_pad, P); num_frames: scalar int."""
        K = self.K
        tok_state = jnp.full((K,), -1, jnp.int32).at[0].set(self.graph.start)
        tok_cost = jnp.full((K,), INF).at[0].set(0.0)
        # initial ε-closure (frame 0 tokens before first ProcessEmitting)
        init_records = []
        for _ in range(self.graph.eps_depth):
            tok_state, tok_cost, p, t, o = self._expand_recombine(
                tok_state, tok_cost, True)
            init_records.append((p, t, o))
        T_pad = loglikes.shape[0]
        active = jnp.arange(T_pad) < num_frames
        (fs, fc), (prev, tids, ols) = jax.lax.scan(
            self._frame_step, (tok_state, tok_cost),
            (loglikes, active))
        # final costs
        ok = fs >= 0
        fin = self.g["final"][jnp.where(ok, fs, 0)]
        total = jnp.where(ok, fc + fin, INF)
        any_final = jnp.isfinite(total).any()
        # fall back to best non-final token if nothing reached a final state
        fallback = jnp.where(ok, fc, INF)
        use = jnp.where(any_final, total, fallback)
        best_idx = jnp.argmin(use)
        best_cost = use[best_idx]
        if init_records:
            iprev = jnp.stack([r[0] for r in init_records])
            itid = jnp.stack([r[1] for r in init_records])
            iol = jnp.stack([r[2] for r in init_records])
        else:
            iprev = jnp.zeros((0, K), jnp.int32)
            itid = jnp.zeros((0, K), jnp.int32)
            iol = jnp.zeros((0, K), jnp.int32)
        return {
            "prev": prev, "tids": tids, "ols": ols,
            "init_prev": iprev, "init_tid": itid, "init_ol": iol,
            "best_idx": best_idx, "best_cost": best_cost,
            "final_cost": fin[best_idx], "tok_cost": fc,
        }

    # ------------------------------------------------------------------
    # host-side API
    # ------------------------------------------------------------------

    def decode(self, loglikes: np.ndarray
               ) -> Tuple[List[int], List[int], float]:
        """Single utterance → (tid alignment, olabel seq, total cost)."""
        T = loglikes.shape[0]
        out = self._decode_jit(jnp.asarray(loglikes, jnp.float32),
                               jnp.int32(T))
        return self._backtrace(jax.tree_util.tree_map(np.asarray, out), T)

    def decode_batch(self, loglikes_padded: np.ndarray,
                     num_frames: np.ndarray):
        """(B, T_pad, P) + (B,) → list of (tids, olabels, cost)."""
        out = self._decode_batch_jit(
            jnp.asarray(loglikes_padded, jnp.float32),
            jnp.asarray(num_frames, jnp.int32))
        out = jax.tree_util.tree_map(np.asarray, out)
        results = []
        for b in range(loglikes_padded.shape[0]):
            one = jax.tree_util.tree_map(lambda x: x[b], out)
            results.append(self._backtrace(one, int(num_frames[b])))
        return results

    def _backtrace(self, out, T: int):
        best_cost = float(out["best_cost"])
        if not np.isfinite(best_cost):
            raise KaldiError("BeamDecoder: no tokens survived")
        idx = int(out["best_idx"])
        E1 = out["prev"].shape[1]     # E+1 sweeps per frame
        rev_tids: List[int] = []
        rev_ols: List[int] = []
        for t in range(T - 1, -1, -1):
            for e in range(E1 - 1, -1, -1):
                tid = int(out["tids"][t, e, idx])
                ol = int(out["ols"][t, e, idx])
                if tid != 0:
                    rev_tids.append(tid)
                if ol != 0:
                    rev_ols.append(ol)
                idx = int(out["prev"][t, e, idx])
                if idx < 0:
                    raise KaldiError("BeamDecoder: broken backpointer chain")
        for e in range(out["init_prev"].shape[0] - 1, -1, -1):
            ol = int(out["init_ol"][e, idx])
            if ol != 0:
                rev_ols.append(ol)
            idx = int(out["init_prev"][e, idx])
        rev_tids.reverse()
        rev_ols.reverse()
        return rev_tids, rev_ols, best_cost
