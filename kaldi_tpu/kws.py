"""Keyword search over lattices.

Parity target: src/kws/ (kws-functions.h) — the reference builds factor
transducer indexes over lattice collections and searches them.  Here
the search runs directly over CompactLattices: for a keyword word
sequence, every lattice occurrence is scored with its posterior
probability (sum over paths containing the keyword at that position)
and located in time via the arcs' transition-id string lengths.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from kaldi_tpu.core.logging import get_logger
from kaldi_tpu.lattice.lattice import CompactLattice, INF

log = get_logger(__name__)


@dataclasses.dataclass
class KwsHit:
    utt: str
    begin_frame: int
    end_frame: int
    posterior: float


def _log_add(a, b):
    return np.logaddexp(a, b)


def search_lattice(clat: CompactLattice, keyword: Sequence[int],
                   acoustic_scale: float = 1.0, lm_scale: float = 1.0
                   ) -> List[Tuple[int, int, float]]:
    """Occurrences of the word-id sequence in one lattice →
    [(begin_frame, end_frame, posterior)]."""
    if clat.start < 0 or not keyword:
        return []
    order = clat.top_order()
    n = clat.num_states

    def arc_ll(a):
        return -(a.graph_cost * lm_scale + a.acoustic_cost * acoustic_scale)

    # forward/backward sums + state times
    alpha = np.full(n, -np.inf)
    alpha[clat.start] = 0.0
    times = np.zeros(n, np.int64)
    for s in order:
        if alpha[s] == -np.inf:
            continue
        for a in clat.arcs[s]:
            v = alpha[s] + arc_ll(a)
            alpha[a.nextstate] = _log_add(alpha[a.nextstate], v)
            times[a.nextstate] = max(times[a.nextstate],
                                     times[s] + len(a.tids))
    beta = np.full(n, -np.inf)
    for s, (gc, ac, _) in clat.finals.items():
        beta[s] = -(gc * lm_scale + ac * acoustic_scale)
    for s in reversed(order):
        for a in clat.arcs[s]:
            beta[s] = _log_add(beta[s], arc_ll(a) + beta[a.nextstate])
    total = beta[clat.start]
    if not np.isfinite(total):
        return []

    # keyword matches: dp over (state, keyword position) carrying the
    # log-sum of path prefixes through the match start
    K = len(keyword)
    hits: Dict[Tuple[int, int], float] = {}   # (begin, end) → log post sum
    # match[s][k] = logsum of (alpha(begin) + inner path) reaching s with
    # k keyword words consumed; track begin time per entry — to keep this
    # tractable, key on (s, k, begin_time)
    cur: Dict[Tuple[int, int, int], float] = {}
    for s in order:
        if alpha[s] == -np.inf:
            continue
        for a in clat.arcs[s]:
            ll = arc_ll(a)
            if a.word == 0:
                # ε advances existing partial matches without consuming
                for (ss, k, b), v in list(cur.items()):
                    if ss == s:
                        key = (a.nextstate, k, b)
                        cur[key] = _log_add(cur.get(key, -np.inf), v + ll)
                continue
            # start a new match
            if a.word == keyword[0]:
                v = alpha[s] + ll
                if K == 1:
                    e = times[s] + len(a.tids)
                    post_log = v + beta[a.nextstate] - total
                    hk = (int(times[s]), int(e))
                    hits[hk] = _log_add(hits.get(hk, -np.inf), post_log)
                else:
                    key = (a.nextstate, 1, int(times[s]))
                    cur[key] = _log_add(cur.get(key, -np.inf), v)
            # extend existing matches
            for (ss, k, b), v in list(cur.items()):
                if ss == s and k < K and a.word == keyword[k]:
                    if k + 1 == K:
                        e = times[s] + len(a.tids)
                        post_log = v + ll + beta[a.nextstate] - total
                        hk = (b, int(e))
                        hits[hk] = _log_add(hits.get(hk, -np.inf), post_log)
                    else:
                        key = (a.nextstate, k + 1, b)
                        cur[key] = _log_add(cur.get(key, -np.inf), v + ll)
    return [(b, e, float(min(math.exp(p), 1.0)))
            for (b, e), p in sorted(hits.items())]


def keyword_search(lattices: Dict[str, CompactLattice],
                   keywords: Dict[str, Sequence[int]],
                   min_posterior: float = 0.01,
                   acoustic_scale: float = 1.0) -> Dict[str, List[KwsHit]]:
    """Search every keyword in every lattice (kws pipeline entry)."""
    results: Dict[str, List[KwsHit]] = {kw: [] for kw in keywords}
    for utt, clat in lattices.items():
        for kw_id, seq in keywords.items():
            for b, e, post in search_lattice(clat, seq, acoustic_scale):
                if post >= min_posterior:
                    results[kw_id].append(KwsHit(utt, b, e, post))
    for kw in results:
        results[kw].sort(key=lambda h: -h.posterior)
    return results
