"""Tests for lattice N-best, posteriors, MBR, and LM rescoring."""

import math

import numpy as np
import pytest

from kaldi_tpu.fst.arpa import ArpaModel
from kaldi_tpu.fst.fst import SymbolTable
from kaldi_tpu.lattice import (
    CompactArc,
    CompactLattice,
    compose_lm,
    forward_backward_post,
    mbr_decode,
    nbest,
    scale_lattice,
)


def _diamond_lattice():
    """Two competing words A(1)/B(2) then common word C(3)."""
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(1, 1.0, 0.5, (11, 12), s[1]))
    c.arcs[s[0]].append(CompactArc(2, 2.0, 0.5, (21,), s[1]))
    c.arcs[s[1]].append(CompactArc(3, 0.5, 0.5, (31,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    return c


def test_nbest():
    c = _diamond_lattice()
    paths = nbest(c, 5)
    assert len(paths) == 2
    assert paths[0][0] == [1, 3]
    assert abs(paths[0][1] - 2.5) < 1e-9
    assert paths[1][0] == [2, 3]
    assert abs(paths[1][1] - 3.5) < 1e-9


def test_forward_backward_post():
    c = _diamond_lattice()
    post, total = forward_backward_post(c)
    # P(A)/P(B) = exp(-2.5)/exp(-3.5) → P(A) = 1/(1+e^-1)
    pa = 1.0 / (1.0 + math.exp(-1.0))
    assert abs(post[(0, 0)] - pa) < 1e-6
    assert abs(post[(0, 1)] - (1 - pa)) < 1e-6
    assert abs(post[(1, 0)] - 1.0) < 1e-6
    ref_total = np.logaddexp(-2.5, -3.5)
    assert abs(total - ref_total) < 1e-6


def test_scale_lattice():
    c = _diamond_lattice()
    scale_lattice(c, lm_scale=2.0, acoustic_scale=0.5)
    assert abs(c.arcs[0][0].graph_cost - 2.0) < 1e-9
    assert abs(c.arcs[0][0].acoustic_cost - 0.25) < 1e-9


def test_mbr_matches_map_on_clear_lattice():
    c = _diamond_lattice()
    r = mbr_decode(c)
    assert r.words == [1, 3]
    assert all(0.0 <= x <= 1.0 for x in r.confidences)
    assert r.confidences[1] > 0.99  # C is certain
    assert r.bayes_risk >= 0.0


def test_compose_lm_rescoring_changes_ranking():
    """An LM strongly preferring word B must flip the best path."""
    c = _diamond_lattice()
    words = SymbolTable.from_list(["<eps>", "A", "B", "C"])
    words.add("<s>")
    words.add("</s>")

    def score(hist, w):
        # strongly prefer B over A; neutral otherwise
        if w == "B":
            return math.log(0.9)
        if w == "A":
            return math.log(0.001)
        return math.log(0.5)

    out = compose_lm(c, score, words, scale=1.0)
    paths = nbest(out, 2)
    assert paths[0][0] == [2, 3]     # B C now wins
    # costs shifted by exactly -log P terms
    exp_bc = 3.5 - math.log(0.9) - math.log(0.5) - math.log(0.5)
    assert abs(paths[0][1] - exp_bc) < 1e-6


def test_compose_lm_subtract_then_add_roundtrip():
    """compose(+1) then compose(−1) with the same LM restores costs."""
    c = _diamond_lattice()
    words = SymbolTable.from_list(["<eps>", "A", "B", "C", "<s>", "</s>"])

    def score(hist, w):
        return math.log(0.25) if w != "</s>" else math.log(0.5)

    once = compose_lm(c, score, words, scale=1.0)
    back = compose_lm(once, score, words, scale=-1.0)
    p0 = sorted(nbest(c, 5))
    p1 = sorted(nbest(back, 5))
    assert [w for w, _ in p0] == [w for w, _ in p1]
    for (w0, c0), (w1, c1) in zip(p0, p1):
        assert abs(c0 - c1) < 1e-6


def _chain_lattice(rng, n_slots=6, n_alts=4):
    """Random sausage-ish lattice: n_slots positions, n_alts competing
    words each, random costs — big enough that pruning has teeth."""
    c = CompactLattice()
    states = [c.add_state() for _ in range(n_slots + 1)]
    c.start = states[0]
    wid = 1
    for t in range(n_slots):
        for a in range(n_alts):
            c.arcs[states[t]].append(CompactArc(
                1 + (t * n_alts + a) % 9, float(rng.uniform(0, 4)),
                float(rng.uniform(0, 2)), (t + 1,), states[t + 1]))
    c.finals[states[-1]] = (0.0, 0.0, ())
    return c


def test_compose_lm_pruned_wide_beam_equals_full():
    """With a generous beam, pruned composition returns the same path
    set and weights as full composition."""
    from kaldi_tpu.lattice.rescore import compose_lm_pruned
    rng = np.random.default_rng(7)
    c = _chain_lattice(rng)
    words = SymbolTable.from_list(
        ["<eps>"] + [f"w{i}" for i in range(1, 10)] + ["<s>", "</s>"])

    def score(hist, w):
        # history-dependent: repeat of last word is cheap
        if hist and hist[-1] == w:
            return math.log(0.9)
        return math.log(1.0 / 20)

    full = compose_lm(c, score, words, scale=1.0)
    pruned = compose_lm_pruned(c, score, words, scale=1.0, beam=1000.0)
    pf, pp = nbest(full, 50), nbest(pruned, 50)
    assert [w for w, _ in pf] == [w for w, _ in pp]
    for (_, cf), (_, cp) in zip(pf, pp):
        assert abs(cf - cp) < 1e-6


def test_compose_lm_pruned_keeps_best_path_under_tight_limits():
    """With a tight beam and arc cap, the best path must survive and
    equal the full composition's best path; the output must be smaller."""
    from kaldi_tpu.lattice.rescore import compose_lm_pruned
    rng = np.random.default_rng(3)
    c = _chain_lattice(rng, n_slots=8, n_alts=5)
    words = SymbolTable.from_list(
        ["<eps>"] + [f"w{i}" for i in range(1, 10)] + ["<s>", "</s>"])

    def score(hist, w):
        return math.log(1.0 / (1 + (hash(w) % 7)))

    full = compose_lm(c, score, words, scale=1.0)
    pruned = compose_lm_pruned(c, score, words, scale=1.0, beam=2.0,
                               max_arcs=60)
    assert pruned.num_arcs <= 60
    assert pruned.num_arcs < full.num_arcs
    bw_f = full.best_path()[1]
    bw_p = pruned.best_path()[1]
    assert bw_f == bw_p
    # every surviving path's cost matches the full composition's cost
    # for the same word sequence
    full_costs = {tuple(w): cost for w, cost in nbest(full, 10000)}
    for w, cost in nbest(pruned, 10000):
        assert abs(full_costs[tuple(w)] - cost) < 1e-6
