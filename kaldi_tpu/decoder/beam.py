"""Vectorized token-passing Viterbi beam decoder with exact lattice
generation, for graphs too large to decode densely.

Parity target: src/decoder/lattice-faster-decoder.h
(LatticeFasterDecoderTpl::{ProcessEmitting, ProcessNonemitting,
GetRawLattice}, LatticeFasterDecoderConfig{beam, max_active,
lattice_beam}) and the fork's GPU decoder (arXiv:1804.03243 — parallel
arc expansion with load-balanced work queues, token recombination, and
exact lattice arc recording on device).

TPU-first design. TPUs have no atomics, so the CUDA decoder's two key
devices are re-expressed with the TPU's fast primitives — sorts and
prefix sums:

  per frame (one lax.scan step, fully data-independent control flow):
    1. load-balance — active tokens' out-arc COUNTS are prefix-summed
       and a fixed arc budget M is distributed over them with a
       searchsorted (the CudaFst load-balanced expansion: work items
       are arcs, not tokens, so a 40-arc word-start state costs no
       more padding than a 1-arc chain state)
    2. expand      — candidate cost = tok_cost + graph_w −
       scale·loglike[pdf[tid]], one gather per field
    3. recombine   — lax.sort by (next_state, cost): the first
       candidate of each state run is the surviving token (the
       atomic-min of cuda-decoder-kernels.cu becomes a sort + segment
       head test), beam pruning against the running best
    4. max-active  — second sort by cost over the segment heads keeps
       the best K states (GetCutoff's histogram → top-K by sort)
    5. ε-sweeps    — the graph's ε-DAG depth is measured at pack time;
       that many masked repetitions of 1–4 over the ε arc set replace
       ProcessNonemitting's priority queue
    6. lattice     — all candidates within lattice_beam of their
       state's best whose destination survived are sorted by
       extra-cost and the first L are written to this frame's slice of
       a preallocated HBM record buffer (GetRawLattice's ForwardLinks;
       budget-L emission with extra-cost priority keeps every Viterbi
       arc, so the best path is always in the lattice)

Host-side assembly converts the (T, L) record tensors into a pruned
raw Lattice with α/β extra-cost pruning — numpy-vectorized per level,
no per-arc Python loops (the reference's PruneActiveTokens +
GetRawLattice pass).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.fst.csr import CsrGraph
from kaldi_tpu.lattice.lattice import Lattice, LatticeArc

log = get_logger(__name__)

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class BeamDecoderConfig:
    """Mirrors LatticeFasterDecoderConfig option names."""
    beam: float = 16.0
    max_active: int = 7000         # K: token capacity
    acoustic_scale: float = 0.1
    lattice_beam: float = 8.0      # extra-cost beam for lattice arcs
    # device-side budgets (0 = auto):
    arc_budget: int = 0            # M: emitting arcs expanded per frame
    lattice_arcs_per_frame: int = 0   # L: records per emitting sweep;
    #                                   0 disables lattice generation


def _forward_fill(vals: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """vals where mask, forward-filled along axis 0 (associative)."""

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, av), af | bf

    filled, _ = jax.lax.associative_scan(op, (vals, mask))
    return filled


class BeamDecoder:
    """Compiled decoder bound to one graph (the graph arrays live in HBM
    once; every decode reuses them — mirroring CudaFst residency)."""

    def __init__(self, graph: CsrGraph, tid_to_pdf: np.ndarray,
                 config: BeamDecoderConfig = None):
        self.graph = graph
        self.config = config or BeamDecoderConfig()
        self.K = max(1, min(self.config.max_active, graph.num_states))
        # arc budgets: enough for every arc when the graph is small
        # (exact mode), else ~2 arcs per token (typical large-graph
        # average out-degree is ~1.5; the load balancer fills budget
        # slots best-token-first so overflow drops the worst tokens'
        # arcs, and dropped_arcs reports it)
        self.M = self.config.arc_budget or min(
            graph.num_emitting_arcs, max(2 * self.K, 8192))
        self.Me = min(max(graph.num_eps_arcs, 1), max(2 * self.K, 4096))
        self.L = self.config.lattice_arcs_per_frame
        if self.L and self.L < self.K:
            raise KaldiError("lattice_arcs_per_frame must be >= max_active "
                             "(every Viterbi arc must fit)")
        self.Le = max(self.L // 2, min(2 * self.K, self.L)) if self.L else 0
        # The graph is passed to the jitted decode as an ARGUMENT pytree,
        # never captured as a closure constant: embedded multi-megabyte
        # literals blow up both MLIR lowering (device-committed constants
        # get fetched back across the device transport — minutes on the
        # tunneled TPU) and XLA compile time, and would re-compile per
        # graph.  As arguments, the arrays upload once (device_put) and
        # one compiled decoder serves any graph of the same shape.
        self._g_host = {
            "e_off": np.asarray(graph.e_offsets, np.int32),
            "e_il": np.asarray(graph.e_ilabel, np.int32),
            "e_ol": np.asarray(graph.e_olabel, np.int32),
            "e_w": np.asarray(graph.e_weight, np.float32),
            "e_ns": np.asarray(graph.e_nextstate, np.int32),
            "n_off": np.asarray(graph.n_offsets, np.int32),
            "n_ol": np.asarray(graph.n_olabel, np.int32),
            "n_w": np.asarray(graph.n_weight, np.float32),
            "n_ns": np.asarray(graph.n_nextstate, np.int32),
            "final": np.asarray(graph.final_costs, np.float32),
            "tid2pdf": np.asarray(tid_to_pdf, np.int32),
        }
        self.g = None   # bound to the argument pytree inside _decode_scan
        self._g_dev = None   # uploaded lazily on first decode
        self._compiled = {}  # (batch?, B, T_pad, P) → compiled executable

    def _graph_arrays(self):
        if self._g_dev is None:
            self._g_dev = jax.device_put(self._g_host)
        return self._g_dev

    def _get_compiled(self, shape):
        """AOT-compile the decode for a (B?, T_pad, P) shape.  Lowering
        uses abstract ShapeDtypeStructs, NOT concrete device arrays —
        tracing with device-resident arguments makes the lowering
        machinery consult the device transport per value (minutes over
        a tunneled TPU); abstract avals lower in seconds."""
        if shape in self._compiled:
            return self._compiled[shape]
        sds = jax.ShapeDtypeStruct
        g_abs = {k: sds(v.shape, v.dtype) for k, v in self._g_host.items()}
        if len(shape) == 2:           # single utterance (T_pad, P)
            fn = jax.jit(self._decode_scan)
            args = (g_abs, sds(shape, jnp.float32),
                    sds((), jnp.int32))
        else:                         # batch (B, T_pad, P)
            fn = jax.jit(jax.vmap(self._decode_scan, in_axes=(None, 0, 0)))
            args = (g_abs, sds(shape, jnp.float32),
                    sds((shape[0],), jnp.int32))
        compiled = fn.lower(*args).compile()
        self._compiled[shape] = compiled
        return compiled

    def _decode_jit(self, g, loglikes, num_frames):
        return self._get_compiled(tuple(loglikes.shape))(
            g, loglikes, num_frames)

    def _decode_batch_jit(self, g, loglikes, num_frames):
        return self._get_compiled(tuple(loglikes.shape))(
            g, loglikes, num_frames)

    # ------------------------------------------------------------------
    # device-side pieces
    # ------------------------------------------------------------------

    def _sweep(self, tok_state, tok_cost, use_eps: bool, loglike=None):
        """One load-balance→expand→recombine→top-K sweep.

        Returns (new_state, new_cost, vit (prev, tid, ol), records) —
        records is None when lattice emission is off, else a dict of
        (L,) arrays with prev == -1 marking empty slots."""
        g = self.g
        K = self.K
        S = self.graph.num_states
        M = self.Me if use_eps else self.M
        L = self.Le if use_eps else self.L
        off = g["n_off"] if use_eps else g["e_off"]
        ns_arr = g["n_ns"] if use_eps else g["e_ns"]
        w_arr = g["n_w"] if use_eps else g["e_w"]
        ol_arr = g["n_ol"] if use_eps else g["e_ol"]

        valid_tok = tok_state >= 0
        safe_state = jnp.where(valid_tok, tok_state, 0)
        base = off[safe_state]
        count = jnp.where(valid_tok, off[safe_state + 1] - base, 0)

        # 1. load-balanced arc distribution (arc-parallel, not token-
        #    parallel): M work items over the tokens' arc ranges.
        #    Token k's range starts at slot cum[k-1]; scatter each
        #    token's id at its range start and forward-fill — this is
        #    searchsorted without the binary-search while-loop, which
        #    profiles at ~11 ms per call on TPU vs ~0.1 ms for
        #    scatter+associative-scan.
        cum = jnp.cumsum(count)
        j = jnp.arange(M, dtype=jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, cum.dtype), cum[:-1]])
        pos_k = jnp.where(count > 0, starts, M)    # empty ranges dropped
        seed_tok = jnp.full((M,), -1, jnp.int32).at[pos_k].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop")
        tok_of = _forward_fill(seed_tok, seed_tok >= 0)
        tok_of = jnp.clip(tok_of, 0, K - 1)
        seed_start = jnp.zeros((M,), cum.dtype).at[pos_k].set(
            starts, mode="drop")
        range_start = _forward_fill(seed_start, seed_tok >= 0)
        within = j - range_start
        in_range = j < cum[K - 1]
        dropped = jnp.maximum(cum[K - 1] - M, 0)   # arc-budget overflow
        aidx = jnp.clip(base[tok_of] + within, 0,
                        max(len(w_arr) - 1, 0))

        # 2. expand.  Only (state, cost, position) travel through the
        #    sorts; labels/weights are re-gathered from the arc arrays
        #    by candidate position after selection (cheaper than
        #    carrying 4 extra sort operands on the TPU).
        c_state = ns_arr[aidx]
        gw = w_arr[aidx]
        if use_eps:
            ac = jnp.zeros(M, jnp.float32)
        else:
            il = g["e_il"][aidx]
            ac = -self.config.acoustic_scale * loglike[g["tid2pdf"][il]]
        c_cost = jnp.where(in_range, tok_cost[tok_of] + gw + ac, INF)
        c_prev = tok_of
        c_aidx = aidx + 1                  # 0 marks ε-identity candidates
        if use_eps:
            # surviving-unchanged candidates (tokens keep their state)
            c_state = jnp.concatenate([c_state, safe_state])
            c_cost = jnp.concatenate(
                [c_cost, jnp.where(valid_tok, tok_cost, INF)])
            c_prev = jnp.concatenate([c_prev, jnp.arange(K, dtype=jnp.int32)])
            c_aidx = jnp.concatenate([c_aidx, jnp.zeros(K, jnp.int32)])
        N = c_cost.shape[0]

        def labels_of(pos_sel, valid):
            """(prev, aidx, il, ol, gw, ac) for selected candidates."""
            p = jnp.where(valid, c_prev[pos_sel], -1)
            a = jnp.where(valid, c_aidx[pos_sel], 0)
            ai = jnp.maximum(a - 1, 0)
            real = a > 0
            o = jnp.where(real, ol_arr[ai], 0)
            if use_eps:
                i = jnp.zeros_like(o)
            else:
                i = jnp.where(real, g["e_il"][ai], 0)
            gww = jnp.where(real, w_arr[ai], 0.0)
            if use_eps:
                acc = jnp.zeros_like(gww)
            else:
                acc = jnp.where(
                    real,
                    -self.config.acoustic_scale * loglike[g["tid2pdf"][i]],
                    0.0)
            return p, i, o, gww, acc

        # 3. beam prune + sort-based recombination
        best = jnp.min(c_cost)
        fin = c_cost <= best + self.config.beam
        c_cost = jnp.where(fin, c_cost, INF)
        sort_state = jnp.where(fin, c_state, S)   # invalid sorts last
        pos0 = jnp.arange(N, dtype=jnp.int32)
        st_s, cost_s, pos_s = jax.lax.sort(
            (sort_state, c_cost, pos0), num_keys=2)
        first = jnp.concatenate(
            [jnp.ones(1, bool), st_s[1:] != st_s[:-1]])
        head = first & (st_s < S)
        seg = jnp.cumsum(head.astype(jnp.int32)) - 1     # segment per cand
        seg_cost = _forward_fill(jnp.where(head, cost_s, 0.0), head)

        # 4. max-active: best K segment heads by cost
        key2 = jnp.where(head, cost_s, INF)
        pos = jnp.arange(N, dtype=jnp.int32)
        cost2, st2, pos2 = jax.lax.sort((key2, st_s, pos), num_keys=1)
        ok = jnp.isfinite(cost2[:K])
        new_state = jnp.where(ok, st2[:K], -1).astype(jnp.int32)
        new_cost = jnp.where(ok, cost2[:K], INF)
        vp, vi, vo, _, _ = labels_of(pos_s[pos2[:K]], ok)
        vit = (vp.astype(jnp.int32), vi, vo)

        if not L:
            return new_state, new_cost, vit, None, dropped

        # 6. lattice records: candidates within lattice_beam of their
        #    state's best whose destination token survived
        kept_seg = jnp.where(ok, seg[pos2[:K]], N)
        slot_of_seg = jnp.full((N,), -1, jnp.int32).at[kept_seg].set(
            jnp.arange(K, dtype=jnp.int32), mode="drop")
        dst_slot = slot_of_seg[seg]
        extra = cost_s - seg_cost
        keep = (jnp.isfinite(cost_s) & (extra <= self.config.lattice_beam)
                & (dst_slot >= 0))
        key3 = jnp.where(keep, extra, INF)
        key3s, pos3, rd = jax.lax.sort((key3, pos_s, dst_slot), num_keys=1)

        def fit(x, fill):
            # small graphs can have fewer candidates than the budget
            if x.shape[0] >= L:
                return x[:L]
            return jnp.concatenate(
                [x, jnp.full((L - x.shape[0],), fill, x.dtype)])

        key3s, pos3, rd = fit(key3s, jnp.inf), fit(pos3, 0), fit(rd, -1)
        rvalid = jnp.isfinite(key3s)
        rp, ri, ro, rg, ra = labels_of(pos3, rvalid)
        records = {
            "prev": rp.astype(jnp.int32),
            "tid": ri,
            "ol": ro,
            "gw": rg,
            "ac": ra,
            "dst": jnp.where(rvalid, rd, -1),
        }
        return new_state, new_cost, vit, records, dropped

    @staticmethod
    def _identity_vit(K: int):
        return (jnp.arange(K, dtype=jnp.int32), jnp.zeros(K, jnp.int32),
                jnp.zeros(K, jnp.int32))

    @staticmethod
    def _identity_records(K: int, L: int):
        idn = jnp.arange(K, dtype=jnp.int32)
        pad = jnp.full((L - K,), -1, jnp.int32)
        z = jnp.zeros(L, jnp.int32)
        return {
            "prev": jnp.concatenate([idn, pad]),
            "tid": z, "ol": z,
            "gw": jnp.zeros(L, jnp.float32), "ac": jnp.zeros(L, jnp.float32),
            "dst": jnp.concatenate([idn, pad]),
        }

    def _frame_step(self, carry, xs):
        tok_state, tok_cost = carry
        loglike, active = xs
        E = self.graph.num_sweeps
        K = self.K
        sweeps = []
        s, c, vit, rec, dropped = self._sweep(tok_state, tok_cost, False,
                                              loglike)
        sweeps.append((vit, rec, self.L))
        for _ in range(E):
            s, c, vit, rec, drop_e = self._sweep(s, c, True)
            sweeps.append((vit, rec, self.Le))
            dropped = dropped + drop_e
        # identity step for padded frames
        s = jnp.where(active, s, tok_state)
        c = jnp.where(active, c, tok_cost)
        idv = self._identity_vit(K)
        vit_out = []
        rec_out = []
        for vit, rec, L in sweeps:
            vit_out.append(tuple(
                jnp.where(active, v, d) for v, d in zip(vit, idv)))
            if rec is not None:
                idr = self._identity_records(K, L)
                rec_out.append({k: jnp.where(active, rec[k], idr[k])
                                for k in rec})
        prev = jnp.stack([v[0] for v in vit_out])      # (E+1, K)
        tids = jnp.stack([v[1] for v in vit_out])
        ols = jnp.stack([v[2] for v in vit_out])
        out = (prev, tids, ols, jnp.where(active, dropped, 0))
        if rec_out:
            emit_rec = rec_out[0]
            eps_rec = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *rec_out[1:]) if E else None
            out = out + (emit_rec, eps_rec)
        return (s, c), out

    def _decode_scan(self, g, loglikes, num_frames):
        """g: graph array pytree; loglikes: (T_pad, P); num_frames: int."""
        K = self.K
        self.g = g
        # tie the initial tokens to a runtime value: XLA would otherwise
        # CONSTANT-FOLD the unrolled initial ε-closure (sorts over tens
        # of thousands of elements in the slow folding interpreter),
        # blowing compile time from seconds to minutes
        rt_zero = jnp.minimum(num_frames, 0)
        tok_state = jnp.full((K,), -1, jnp.int32).at[0].set(
            self.graph.start + rt_zero)
        tok_cost = jnp.full((K,), INF).at[0].set(rt_zero.astype(jnp.float32))
        init_vit = []
        init_rec = []
        for _ in range(self.graph.num_sweeps):
            tok_state, tok_cost, vit, rec, _ = self._sweep(
                tok_state, tok_cost, True)
            init_vit.append(vit)
            if rec is not None:
                init_rec.append(rec)
        T_pad = loglikes.shape[0]
        active = jnp.arange(T_pad) < num_frames
        (fs, fc), scanned = jax.lax.scan(
            self._frame_step, (tok_state, tok_cost), (loglikes, active))
        prev, tids, ols, dropped = scanned[:4]
        # final costs
        okf = fs >= 0
        fin = self.g["final"][jnp.where(okf, fs, 0)]
        total = jnp.where(okf, fc + fin, INF)
        any_final = jnp.isfinite(total).any()
        fallback = jnp.where(okf, fc, INF)
        use = jnp.where(any_final, total, fallback)
        best_idx = jnp.argmin(use)
        out = {
            "prev": prev, "tids": tids, "ols": ols,
            "dropped_arcs": jnp.sum(dropped),
            "best_idx": best_idx, "best_cost": use[best_idx],
            "final_cost": jnp.where(any_final, fin[best_idx], 0.0),
            "tok_state": fs, "tok_cost": fc, "tok_final": fin,
        }
        if init_vit:
            out["init_prev"] = jnp.stack([v[0] for v in init_vit])
            out["init_tid"] = jnp.stack([v[1] for v in init_vit])
            out["init_ol"] = jnp.stack([v[2] for v in init_vit])
        else:
            z = jnp.zeros((0, K), jnp.int32)
            out["init_prev"] = z
            out["init_tid"] = z
            out["init_ol"] = z
        if self.L:
            out["emit_rec"] = scanned[4]            # (T, L) fields
            if self.graph.num_sweeps:
                out["eps_rec"] = scanned[5]         # (T, E, Le) fields
            if init_rec:
                out["init_rec"] = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *init_rec)
        return out

    # ------------------------------------------------------------------
    # host-side API
    # ------------------------------------------------------------------

    def decode(self, loglikes: np.ndarray
               ) -> Tuple[List[int], List[int], float]:
        """Single utterance → (tid alignment, olabel seq, total cost)."""
        T = loglikes.shape[0]
        out = self._decode_jit(self._graph_arrays(),
                               jnp.asarray(loglikes, jnp.float32),
                               jnp.int32(T))
        return self._backtrace(jax.tree_util.tree_map(np.asarray, out), T)

    def decode_batch(self, loglikes_padded: np.ndarray,
                     num_frames: np.ndarray):
        """(B, T_pad, P) + (B,) → list of (tids, olabels, cost)."""
        out = self._decode_batch_jit(
            self._graph_arrays(),
            jnp.asarray(loglikes_padded, jnp.float32),
            jnp.asarray(num_frames, jnp.int32))
        out = jax.tree_util.tree_map(np.asarray, out)
        results = []
        for b in range(loglikes_padded.shape[0]):
            one = jax.tree_util.tree_map(lambda x: x[b], out)
            results.append(self._backtrace(one, int(num_frames[b])))
        return results

    def decode_lattice(self, loglikes: np.ndarray) -> Lattice:
        """Single utterance → pruned raw Lattice (GetRawLattice +
        lattice-beam pruning).  Requires lattice_arcs_per_frame > 0."""
        if not self.L:
            raise KaldiError("decode_lattice needs lattice_arcs_per_frame")
        T = loglikes.shape[0]
        out = self._decode_jit(self._graph_arrays(),
                               jnp.asarray(loglikes, jnp.float32),
                               jnp.int32(T))
        return self._build_lattice(
            jax.tree_util.tree_map(np.asarray, out), T)

    def decode_lattice_batch(self, loglikes_padded: np.ndarray,
                             num_frames: np.ndarray) -> List[Lattice]:
        if not self.L:
            raise KaldiError("decode_lattice needs lattice_arcs_per_frame")
        out = self._decode_batch_jit(
            self._graph_arrays(),
            jnp.asarray(loglikes_padded, jnp.float32),
            jnp.asarray(num_frames, jnp.int32))
        out = jax.tree_util.tree_map(np.asarray, out)
        return [self._build_lattice(
            jax.tree_util.tree_map(lambda x: x[b], out),
            int(num_frames[b]))
            for b in range(loglikes_padded.shape[0])]

    # -- Viterbi backtrace -------------------------------------------------

    def _backtrace(self, out, T: int):
        best_cost = float(out["best_cost"])
        if not np.isfinite(best_cost):
            raise KaldiError("BeamDecoder: no tokens survived")
        idx = int(out["best_idx"])
        E1 = out["prev"].shape[1]
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

    # -- lattice assembly (vectorized, no per-arc Python) ------------------

    def _level_records(self, out, T: int):
        """Yield per-level record dicts in topological order."""
        E = self.graph.num_sweeps
        if "init_rec" in out:
            for e in range(E):
                yield {k: out["init_rec"][k][e] for k in out["init_rec"]}
        for t in range(T):
            yield {k: out["emit_rec"][k][t] for k in out["emit_rec"]}
            if E:
                for e in range(E):
                    yield {k: out["eps_rec"][k][t, e]
                           for k in out["eps_rec"]}

    def _build_lattice(self, out, T: int) -> Lattice:
        K = self.K
        beam = self.config.lattice_beam

        # pass 1: assign state ids level by level; collect arc arrays
        cur = np.full(K, -1, np.int64)
        cur[0] = 0
        n_states = 1
        arcs_src: List[np.ndarray] = []
        arcs_dst: List[np.ndarray] = []
        arcs_il: List[np.ndarray] = []
        arcs_ol: List[np.ndarray] = []
        arcs_gw: List[np.ndarray] = []
        arcs_ac: List[np.ndarray] = []
        level_sizes: List[int] = []
        for rec in self._level_records(out, T):
            prev = rec["prev"]
            valid = prev >= 0
            valid[valid] &= cur[prev[valid]] >= 0
            dst = rec["dst"][valid]
            uniq = np.unique(dst)
            new = np.full(K, -1, np.int64)
            new[uniq] = n_states + np.arange(len(uniq))
            n_states += len(uniq)
            arcs_src.append(cur[prev[valid]])
            arcs_dst.append(new[dst])
            arcs_il.append(rec["tid"][valid])
            arcs_ol.append(rec["ol"][valid])
            arcs_gw.append(rec["gw"][valid])
            arcs_ac.append(rec["ac"][valid])
            level_sizes.append(int(valid.sum()))
            cur = new
        src = np.concatenate(arcs_src)
        dst = np.concatenate(arcs_dst)
        il = np.concatenate(arcs_il)
        ol = np.concatenate(arcs_ol)
        gw = np.concatenate(arcs_gw).astype(np.float64)
        ac = np.concatenate(arcs_ac).astype(np.float64)
        w = gw + ac

        # finals (graph final weight on surviving last-level tokens)
        fin_slots = np.nonzero((cur >= 0)
                               & np.isfinite(out["tok_final"]))[0]
        fin_states = cur[fin_slots]
        fin_w = out["tok_final"][fin_slots].astype(np.float64)
        if len(fin_states) == 0:   # no token reached a final state
            fin_states = cur[np.nonzero(cur >= 0)[0]]
            fin_w = np.zeros(len(fin_states))

        # pass 2: α/β over the level-ordered DAG (vectorized per level)
        alpha = np.full(n_states, np.inf)
        alpha[0] = 0.0
        pos = 0
        for n in level_sizes:
            sl = slice(pos, pos + n)
            np.minimum.at(alpha, dst[sl], alpha[src[sl]] + w[sl])
            pos += n
        beta = np.full(n_states, np.inf)
        np.minimum.at(beta, fin_states, fin_w)
        pos = len(src)
        for n in reversed(level_sizes):
            sl = slice(pos - n, pos)
            np.minimum.at(beta, src[sl], w[sl] + beta[dst[sl]])
            pos -= n
        best = alpha[fin_states] + fin_w
        if not len(best) or not np.isfinite(best.min()):
            raise KaldiError("BeamDecoder: empty lattice")
        bound = best.min() + beam

        keep_arc = alpha[src] + w + beta[dst] <= bound
        keep_state = np.zeros(n_states, bool)
        keep_state[0] = True
        keep_state[src[keep_arc]] = True
        keep_state[dst[keep_arc]] = True
        remap = np.cumsum(keep_state) - 1

        lat = Lattice()
        n_kept = int(keep_state.sum())
        for _ in range(n_kept):
            lat.add_state()
        lat.start = 0
        ks = remap[src[keep_arc]]
        kd = remap[dst[keep_arc]]
        kil = il[keep_arc]
        kol = ol[keep_arc]
        kgw = gw[keep_arc]
        kac = ac[keep_arc]
        for i in range(len(ks)):
            lat.arcs[ks[i]].append(LatticeArc(
                int(kil[i]), int(kol[i]), float(kgw[i]), float(kac[i]),
                int(kd[i])))
        fk = keep_state[fin_states] & (alpha[fin_states] + fin_w <= bound)
        for s, wgt in zip(fin_states[fk], fin_w[fk]):
            lat.set_final(int(remap[s]), float(wgt), 0.0)
        return lat
