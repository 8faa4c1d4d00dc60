"""Streaming (online) decoding.

Parity targets: src/online2/online-nnet3-decoding.h
(SingleUtteranceNnet3Decoder::AdvanceDecoding / GetLattice),
src/decoder/lattice-faster-online-decoder.h (BestPathEnd /
TraceBackBestPath — partial results at any time), and
src/online2/online-endpoint.h (OnlineEndpointConfig rules).

The decoder carries the dense α vector across chunks; each
AdvanceDecoding runs the jitted chunk scan (fixed chunk buckets so one
compilation serves the whole stream) and appends the chunk's
backpointers host-side for partial/final traceback.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.decoder.dense import BIG, DenseDecoder, DenseDecoderConfig

log = get_logger(__name__)


@dataclasses.dataclass
class OnlineEndpointRule:
    """One endpointing rule (online-endpoint.h OnlineEndpointRule)."""
    must_contain_nonsilence: bool
    min_trailing_silence: float      # seconds
    max_relative_cost: float = 1e10
    min_utterance_length: float = 0.0


def default_endpoint_rules() -> List[OnlineEndpointRule]:
    """The reference's 5 default rules."""
    return [
        OnlineEndpointRule(False, 5.0, 1e10, 0.0),    # rule1
        OnlineEndpointRule(True, 0.5, 2.0, 0.0),      # rule2
        OnlineEndpointRule(True, 1.0, 8.0, 0.0),      # rule3
        OnlineEndpointRule(True, 2.0, 1e10, 0.0),     # rule4
        OnlineEndpointRule(False, 0.0, 1e10, 20.0),   # rule5
    ]


class SingleUtteranceDecoder:
    """Streaming wrapper over DenseDecoder for one utterance."""

    def __init__(self, decoder: DenseDecoder, chunk_frames: int = 32,
                 frame_shift: float = 0.01, silence_phones=(),
                 trans_model=None):
        self.dec = decoder
        self.chunk = chunk_frames
        self.frame_shift = frame_shift
        self.silence_phones = set(silence_phones)
        self.tm = trans_model
        S = decoder.graph.num_states
        alpha = np.full(S, 1e30, np.float32)
        alpha[decoder.graph.start] = 0.0
        self._alpha = jnp.asarray(alpha)
        # apply initial ε-closure via one empty advance
        self._alpha = self._eps_jit()(self._alpha)
        self._bps: List[np.ndarray] = []       # per frame (E+1, S)
        self._T = 0
        self._chunk_jit = None

    # -- device pieces ------------------------------------------------------
    def _eps_jit(self):
        dec = self.dec
        c = dec.c
        E = dec.graph.eps_depth

        @jax.jit
        def f(alpha):
            for _ in range(E):
                cand = alpha[c["n_src"]] + c["n_w"]
                alpha = jnp.minimum(alpha, jnp.min(cand, axis=1))
            return alpha

        return f

    def _ensure_chunk_jit(self):
        if self._chunk_jit is not None:
            return
        dec = self.dec
        c = dec.c
        E = dec.graph.eps_depth
        beam = dec.config.beam
        scale = dec.config.acoustic_scale

        def eps_sweep(alpha):
            cand = alpha[c["n_src"]] + c["n_w"]
            best = jnp.min(cand, axis=1)
            arg = jnp.argmin(cand, axis=1).astype(jnp.int32)
            keep = alpha <= best
            return jnp.minimum(alpha, best), jnp.where(keep, -1, arg)

        def frame_step(alpha, xs):
            loglike, active = xs
            ac = -scale * loglike[c["e_pdf"]]
            cand = alpha[c["e_src"]] + c["e_w"] + ac
            new = jnp.min(cand, axis=1)
            bp_e = jnp.argmin(cand, axis=1).astype(jnp.int32)
            m = jnp.min(new)
            new = jnp.where(new > m + beam, BIG, new)
            bps = [bp_e]
            for _ in range(E):
                new, bp = eps_sweep(new)
                bps.append(bp)
            new = jnp.where(active, new, alpha)
            bps = [jnp.where(active, b, -1) for b in bps]
            return new, jnp.stack(bps)

        @jax.jit
        def advance(alpha, loglikes, n_valid):
            active = jnp.arange(loglikes.shape[0]) < n_valid
            return jax.lax.scan(frame_step, alpha, (loglikes, active))

        self._chunk_jit = advance

    # -- streaming API ------------------------------------------------------
    def advance_decoding(self, loglikes: np.ndarray) -> None:
        """Consume (n, P) new frames of acoustic scores."""
        self._ensure_chunk_jit()
        n = loglikes.shape[0]
        i = 0
        while i < n:
            take = min(self.chunk, n - i)
            pad = np.zeros((self.chunk, loglikes.shape[1]), np.float32)
            pad[:take] = loglikes[i:i + take]
            self._alpha, bps = self._chunk_jit(self._alpha,
                                               jnp.asarray(pad),
                                               jnp.int32(take))
            bps = np.asarray(bps)
            for t in range(take):
                self._bps.append(bps[t])
            self._T += take
            i += take

    @property
    def num_frames_decoded(self) -> int:
        return self._T

    def _best_state(self, use_final: bool) -> Tuple[int, float, float]:
        alpha = np.asarray(self._alpha)
        final = np.asarray(self.dec.graph.final)
        if use_final:
            total = alpha + final
            if total.min() < 1e29:
                s = int(np.argmin(total))
                return s, float(total[s]), float(alpha.min())
        s = int(np.argmin(alpha))
        return s, float(alpha[s]), float(alpha.min())

    def _traceback(self, state: int) -> Tuple[List[int], List[int]]:
        g = self.dec.graph
        s = state
        rev_tids: List[int] = []
        rev_ols: List[int] = []
        for t in range(self._T - 1, -1, -1):
            bp_t = self._bps[t]
            E1 = bp_t.shape[0]
            for e in range(E1 - 1, 0, -1):
                slot = int(bp_t[e, s])
                if slot >= 0:
                    ol = int(g.n_ol[s, slot])
                    if ol:
                        rev_ols.append(ol)
                    s = int(g.n_src[s, slot])
            slot = int(bp_t[0, s])
            if slot < 0:
                raise KaldiError("online traceback: broken chain")
            tid = int(g.e_il[s, slot])
            ol = int(g.e_ol[s, slot])
            if ol:
                rev_ols.append(ol)
            rev_tids.append(tid)
            s = int(g.e_src[s, slot])
        rev_tids.reverse()
        rev_ols.reverse()
        return rev_tids, rev_ols

    def get_best_path(self, use_final_probs: bool = False
                      ) -> Tuple[List[int], List[int], float]:
        """Partial (or final) result at any time
        (LatticeFasterOnlineDecoder::BestPathEnd + TraceBackBestPath)."""
        if self._T == 0:
            return [], [], 0.0
        s, cost, _ = self._best_state(use_final_probs)
        tids, ols = self._traceback(s)
        return tids, ols, cost

    # -- endpointing --------------------------------------------------------
    def trailing_silence_frames(self) -> int:
        if self.tm is None or not self.silence_phones:
            return 0
        tids, _ = self._traceback(self._best_state(False)[0])
        n = 0
        for tid in reversed(tids):
            if self.tm.transition_id_to_phone(tid) in self.silence_phones:
                n += 1
            else:
                break
        return n

    def endpoint_detected(self,
                          rules: Optional[List[OnlineEndpointRule]] = None
                          ) -> bool:
        """online-endpoint.h EndpointDetected."""
        if self._T == 0:
            return False
        rules = rules or default_endpoint_rules()
        utt_len = self._T * self.frame_shift
        trailing = self.trailing_silence_frames() * self.frame_shift
        contains_nonsil = trailing < utt_len
        _, best_cost, best_any = self._best_state(True)
        relative_cost = best_cost - best_any
        for r in rules:
            if r.must_contain_nonsilence and not contains_nonsil:
                continue
            if trailing < r.min_trailing_silence:
                continue
            if relative_cost > r.max_relative_cost:
                continue
            if utt_len < r.min_utterance_length:
                continue
            return True
        return False
