"""Phone alignment and alignment-boosting of compact lattices.

Parity targets: src/lat/phone-align-lattice.h (PhoneAlignLattice —
latbin/lattice-align-phones.cc) and src/lat/lattice-functions.h
LatticeBoost (latbin/lattice-boost-ali.cc, the boosted-MMI denominator
preparation of Povey et al. 2008).
"""

from __future__ import annotations

from typing import List, Sequence, Set, Tuple

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
from kaldi_tpu.lattice.word_align import _runs

log = get_logger(__name__)


def phone_align_lattice(clat: CompactLattice, tm,
                        replace_output_symbols: bool = True
                        ) -> CompactLattice:
    """Split every arc at phone boundaries so each output arc carries
    exactly one phone's tids (PhoneAlignLattice).  With
    ``replace_output_symbols`` the olabel becomes the phone id (the
    lattice-align-phones default used by scoring pipelines); otherwise
    the word rides the first sub-arc.  Path tid strings and weights are
    preserved exactly: the full (graph, acoustic) weight of an arc goes
    on its first sub-arc."""
    out = CompactLattice()
    for _ in range(clat.num_states):
        out.add_state()
    out.start = clat.start

    def emit(src: int, dst: int, word: int, gc: float, ac: float,
             tids: Sequence[int], final_pair=None) -> None:
        runs = _runs(tm, list(tids))
        if not runs:
            if final_pair is not None:
                prev = out.finals.get(src)
                if prev is None or gc + ac < prev[0] + prev[1]:
                    out.finals[src] = (gc, ac, ())
            else:
                out.arcs[src].append(CompactArc(
                    word if not replace_output_symbols else 0,
                    gc, ac, (), dst))
            return
        cur = src
        for i, (phone, run_tids) in enumerate(runs):
            last = i == len(runs) - 1
            olabel = phone if replace_output_symbols else \
                (word if i == 0 else 0)
            w = (gc, ac) if i == 0 else (0.0, 0.0)
            if last and final_pair is not None:
                nxt = out.add_state()
                out.arcs[cur].append(CompactArc(
                    olabel, w[0], w[1], tuple(run_tids), nxt))
                prev = out.finals.get(nxt)
                if prev is None or prev[0] + prev[1] > 0.0:
                    out.finals[nxt] = (0.0, 0.0, ())
            else:
                nxt = dst if last else out.add_state()
                out.arcs[cur].append(CompactArc(
                    olabel, w[0], w[1], tuple(run_tids), nxt))
            cur = nxt

    for s in range(clat.num_states):
        for a in clat.arcs[s]:
            emit(s, a.nextstate, a.word, a.graph_cost, a.acoustic_cost,
                 a.tids)
    for s, (gc, ac, ftids) in clat.finals.items():
        if ftids:
            emit(s, -1, 0, gc, ac, ftids, final_pair=(gc, ac))
        else:
            prev = out.finals.get(s)
            if prev is None or gc + ac < prev[0] + prev[1]:
                out.finals[s] = (gc, ac, ())
    return out


def boost_lattice_ali(clat: CompactLattice, tm,
                      ref_tids: Sequence[int], b: float,
                      silence_phones: Set[int] = frozenset(),
                      max_silence_error: float = 0.0) -> CompactLattice:
    """Boosted MMI: decrease each arc's graph cost by
    ``b * #frame-phone-errors`` against the reference alignment
    (LatticeBoost / lattice-boost-ali).  Frames whose lattice phone is
    in ``silence_phones`` count as ``max_silence_error`` errors each
    (the reference's --max-silence default 0.0: silence is never
    penalized)."""
    from kaldi_tpu.lattice.functions import state_times
    ref_phones = [tm.transition_id_to_phone(t) for t in ref_tids]
    times = state_times(clat)
    out = CompactLattice()
    for _ in range(clat.num_states):
        out.add_state()
    out.start = clat.start
    out.finals = dict(clat.finals)

    def arc_errors(t0: int, tids: Sequence[int]) -> float:
        err = 0.0
        for i, tid in enumerate(tids):
            phone = tm.transition_id_to_phone(tid)
            if phone in silence_phones:
                err += max_silence_error
            elif t0 + i >= len(ref_phones) or phone != ref_phones[t0 + i]:
                err += 1.0
        return err

    for s in range(clat.num_states):
        t0 = times[s]
        for a in clat.arcs[s]:
            gc = a.graph_cost - b * arc_errors(t0, a.tids)
            out.arcs[s].append(CompactArc(a.word, gc, a.acoustic_cost,
                                          a.tids, a.nextstate))
    for s, (gc, ac, ftids) in list(out.finals.items()):
        if ftids:
            out.finals[s] = (gc - b * arc_errors(times[s], ftids), ac,
                             ftids)
    return out


def minimize_lattice(clat: CompactLattice) -> CompactLattice:
    """Merge states with identical suffix languages (identical outgoing
    arc sets + final weights), bottom-up — the suffix-sharing pass of
    src/lat/minimize-lattice.h (MinimizeCompactLattice).  Path sets,
    weights and tid strings are preserved exactly."""
    order = clat.top_order()
    rep: List[int] = list(range(clat.num_states))
    sig_to_state = {}
    for s in reversed(order):
        sig = (
            tuple(sorted((a.word, round(a.graph_cost, 9),
                          round(a.acoustic_cost, 9), a.tids,
                          rep[a.nextstate]) for a in clat.arcs[s])),
            clat.finals.get(s))
        if sig in sig_to_state:
            rep[s] = sig_to_state[sig]
        else:
            sig_to_state[sig] = s
    keep = sorted({rep[s] for s in range(clat.num_states)}
                  | {rep[clat.start]})
    new_id = {s: i for i, s in enumerate(keep)}
    out = CompactLattice()
    for _ in keep:
        out.add_state()
    out.start = new_id[rep[clat.start]]
    for s in keep:
        for a in clat.arcs[s]:
            out.arcs[new_id[s]].append(CompactArc(
                a.word, a.graph_cost, a.acoustic_cost, a.tids,
                new_id[rep[a.nextstate]]))
        if s in clat.finals:
            out.finals[new_id[s]] = clat.finals[s]
    return out
