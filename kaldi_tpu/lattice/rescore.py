"""Lattice LM rescoring.

Parity targets: src/latbin/lattice-lmrescore.cc (compose lattice with a
word-level LM FST at a given scale; scale −1 subtracts the old LM) and
src/latbin/lattice-lmrescore-const-arpa.cc with
src/lm/const-arpa-lm.h ConstArpaLmDeterministicFst (on-demand
deterministic LM automaton — here the ArpaModel trie plays the
ConstArpaLm role: a flat in-memory n-gram store queried per (history,
word) without building G).

compose_lm expands each lattice state with the LM history, adding
scale · (−log P(word|hist)) to graph costs; use scale=−1 with the old
LM then scale=+1 with the new one, exactly the reference's two-step
rescoring recipe (SURVEY.md §2 configs: '4-gram lattice rescoring').
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Dict, Optional, Tuple

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.fst.arpa import ArpaModel
from kaldi_tpu.fst.fst import SymbolTable
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice

log = get_logger(__name__)


def compose_lm(clat: CompactLattice,
               score_fn: Callable[[Tuple[str, ...], str], float],
               words: SymbolTable, scale: float = 1.0,
               bos: str = "<s>", eos: str = "</s>",
               max_states: int = 1_000_000) -> CompactLattice:
    """Compose with a deterministic on-demand LM.

    score_fn(history_words, word) → natural-log probability.  The output
    lattice's states are (lattice state, LM history) pairs; graph costs
    gain  −scale · log P(word | history); final states gain the eos
    probability.
    """
    if clat.start < 0:
        return clat
    out = CompactLattice()
    state_map: Dict[Tuple[int, Tuple[str, ...]], int] = {}

    def get(ls: int, hist: Tuple[str, ...]) -> int:
        key = (ls, hist)
        if key not in state_map:
            if len(state_map) >= max_states:
                raise KaldiError("compose_lm: state blowup")
            state_map[key] = out.add_state()
        return state_map[key]

    start_key = (clat.start, (bos,))
    out.start = get(*start_key)
    queue = deque([start_key])
    seen = {start_key}
    while queue:
        ls, hist = queue.popleft()
        src = state_map[(ls, hist)]
        if ls in clat.finals:
            gc, ac, tids = clat.finals[ls]
            eos_lp = score_fn(hist, eos)
            out.finals[src] = (gc - scale * eos_lp, ac, tids)
        for a in clat.arcs[ls]:
            if a.word == 0:
                nhist = hist
                add = 0.0
            else:
                wstr = words.find(a.word)
                add = -scale * score_fn(hist, wstr)
                nhist = hist + (wstr,)
                nhist = nhist[-8:]  # history cap; score_fn truncates anyway
            nk = (a.nextstate, nhist)
            dst = get(*nk)
            out.arcs[src].append(CompactArc(
                a.word, a.graph_cost + add, a.acoustic_cost, a.tids, dst))
            if nk not in seen:
                seen.add(nk)
                queue.append(nk)
    return out


def lmrescore(clat: CompactLattice, old_lm: ArpaModel, new_lm: ArpaModel,
              words: SymbolTable, lm_scale: float = 1.0) -> CompactLattice:
    """Two-step rescoring: subtract the old G scores, add the new LM
    (lattice-lmrescore --lm-scale=-1 + lattice-lmrescore-const-arpa)."""
    no_old = compose_lm(clat, old_lm.score, words, scale=-lm_scale)
    return compose_lm(no_old, new_lm.score, words, scale=lm_scale)
