"""Random-FST property tests for the WFST algorithms.

Mirrors src/fstext/determinize-star-test.cc and friends: generate random
FSTs, apply the op, check invariants and RandEquivalent against the
input (SURVEY.md §4).
"""

import random

import pytest

from kaldi_tpu.fst.fst import EPS, INF, Arc, VectorFst
from kaldi_tpu.fst.ops import (
    compose,
    connect,
    determinize_star,
    minimize_encoded,
    rand_equivalent,
    rm_epsilon,
    shortest_path,
)


def rand_acyclic_fst(rng, num_states=10, num_labels=4, num_arcs=20,
                     acceptor=True, eps_prob=0.2):
    """Random acyclic FST (arcs only go forward in state order)."""
    f = VectorFst()
    f.add_states(num_states)
    f.set_start(0)
    for _ in range(num_arcs):
        s = rng.randrange(0, num_states - 1)
        ns = rng.randrange(s + 1, num_states)
        il = 0 if rng.random() < eps_prob else rng.randrange(1, num_labels + 1)
        ol = il if acceptor else rng.randrange(0, num_labels + 1)
        w = round(rng.uniform(0, 3), 3)
        f.add_arc(s, Arc(il, ol, w, ns))
    f.set_final(num_states - 1, round(rng.uniform(0, 1), 3))
    for s in range(1, num_states - 1):
        if rng.random() < 0.2:
            f.set_final(s, round(rng.uniform(0, 1), 3))
    return connect(f)


@pytest.mark.parametrize("seed", range(8))
def test_determinize_star_random(seed):
    rng = random.Random(seed)
    f = rand_acyclic_fst(rng)
    if f.start < 0:
        return
    d = determinize_star(f)
    # deterministic on input: no state has two non-ε arcs with same ilabel,
    # and ε-input arcs only on spill-chain states (which have exactly 1 arc)
    for s in range(d.num_states):
        labels = [a.ilabel for a in d.arcs[s] if a.ilabel != EPS]
        assert len(labels) == len(set(labels))
        eps_arcs = [a for a in d.arcs[s] if a.ilabel == EPS]
        if eps_arcs:
            assert len(d.arcs[s]) == 1
    assert rand_equivalent(f, d, num_paths=40, seed=seed)


@pytest.mark.parametrize("seed", range(8))
def test_minimize_random(seed):
    rng = random.Random(seed + 100)
    f = rand_acyclic_fst(rng)
    if f.start < 0:
        return
    d = determinize_star(f)
    m = minimize_encoded(d)
    assert m.num_states <= d.num_states
    assert rand_equivalent(d, m, num_paths=40, seed=seed)


def test_minimize_merges_identical_suffixes():
    # two parallel branches with identical suffix structure must merge
    f = VectorFst()
    s = [f.add_state() for _ in range(5)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 0.5, s[1]))
    f.add_arc(s[0], Arc(2, 2, 0.5, s[2]))
    f.add_arc(s[1], Arc(3, 3, 0.0, s[3]))
    f.add_arc(s[2], Arc(3, 3, 0.0, s[4]))
    f.set_final(s[3], 0.0)
    f.set_final(s[4], 0.0)
    m = minimize_encoded(f)
    assert m.num_states == 3  # s3/s4 merge, then s1/s2 merge


@pytest.mark.parametrize("seed", range(5))
def test_rm_epsilon_random(seed):
    rng = random.Random(seed + 200)
    f = rand_acyclic_fst(rng, eps_prob=0.4)
    if f.start < 0:
        return
    e = rm_epsilon(f)
    for arcs in e.arcs:
        for a in arcs:
            assert not (a.ilabel == EPS and a.olabel == EPS)
    assert rand_equivalent(f, e, num_paths=40, seed=seed)


def test_compose_linear_chains():
    # A: maps "1 2" -> "a b" (a=10, b=11); B: maps "a b" -> "x y" (x=20,y=21)
    a = VectorFst()
    s = [a.add_state() for _ in range(3)]
    a.set_start(s[0])
    a.add_arc(s[0], Arc(1, 10, 1.0, s[1]))
    a.add_arc(s[1], Arc(2, 11, 0.5, s[2]))
    a.set_final(s[2], 0.25)
    b = VectorFst()
    t = [b.add_state() for _ in range(3)]
    b.set_start(t[0])
    b.add_arc(t[0], Arc(10, 20, 2.0, t[1]))
    b.add_arc(t[1], Arc(11, 21, 0.5, t[2]))
    b.set_final(t[2], 0.0)
    c = compose(a, b)
    path, cost = shortest_path(c)
    assert [p.ilabel for p in path] == [1, 2]
    assert [p.olabel for p in path] == [20, 21]
    assert abs(cost - 4.25) < 1e-6


def test_compose_with_epsilons_no_duplicate_paths():
    # fst1 has an ε-output arc; fst2 has an ε-input arc: the filter must
    # not create duplicate paths (weights would still be min'd, but path
    # count matters for downstream determinization size).
    a = VectorFst()
    s = [a.add_state() for _ in range(3)]
    a.set_start(s[0])
    a.add_arc(s[0], Arc(1, EPS, 0.5, s[1]))
    a.add_arc(s[1], Arc(2, 10, 0.5, s[2]))
    a.set_final(s[2], 0.0)
    b = VectorFst()
    t = [b.add_state() for _ in range(3)]
    b.set_start(t[0])
    b.add_arc(t[0], Arc(EPS, 30, 0.25, t[1]))
    b.add_arc(t[1], Arc(10, 31, 0.25, t[2]))
    b.set_final(t[2], 0.0)
    c = compose(a, b)
    path, cost = shortest_path(c)
    assert abs(cost - 1.5) < 1e-6
    # input sequence 1,2 must be accepted exactly with olabels {30,31}
    ols = [p.olabel for p in path if p.olabel != EPS]
    assert ols == [30, 31]


def test_compose_acceptor_intersection():
    # Two acceptors: compose = intersection; weight adds.
    a = VectorFst()
    s = [a.add_state() for _ in range(3)]
    a.set_start(s[0])
    a.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    a.add_arc(s[0], Arc(2, 2, 0.0, s[1]))
    a.add_arc(s[1], Arc(3, 3, 1.0, s[2]))
    a.set_final(s[2], 0.0)
    b = VectorFst()
    t = [b.add_state() for _ in range(3)]
    b.set_start(t[0])
    b.add_arc(t[0], Arc(2, 2, 0.5, t[1]))
    b.add_arc(t[1], Arc(3, 3, 0.5, t[2]))
    b.set_final(t[2], 0.0)
    c = compose(a, b)
    path, cost = shortest_path(c)
    assert [p.ilabel for p in path] == [2, 3]
    assert abs(cost - 2.0) < 1e-6


def test_shortest_path_picks_min():
    f = VectorFst()
    s = [f.add_state() for _ in range(4)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 5.0, s[3]))
    f.add_arc(s[0], Arc(2, 2, 1.0, s[1]))
    f.add_arc(s[1], Arc(3, 3, 1.0, s[3]))
    f.set_final(s[3], 0.0)
    path, cost = shortest_path(f)
    assert [p.ilabel for p in path] == [2, 3]
    assert abs(cost - 2.0) < 1e-9


def test_connect_removes_dead_states():
    f = VectorFst()
    s = [f.add_state() for _ in range(4)]
    f.set_start(s[0])
    f.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    f.add_arc(s[0], Arc(2, 2, 0.0, s[2]))  # s2 is a dead end
    f.add_arc(s[3], Arc(4, 4, 0.0, s[1]))  # s3 unreachable
    f.set_final(s[1], 0.0)
    c = connect(f)
    assert c.num_states == 2
    assert c.num_arcs == 1


def test_determinize_star_cyclic_lexicon_like():
    """An L-like cyclic FST (loop state, two words sharing a prefix phone,
    disambig symbols making it determinizable)."""
    f = VectorFst()
    loop = f.add_state()
    f.set_start(loop)
    f.set_final(loop, 0.0)
    # word A (olabel 100): phones 1 2 ; word B (olabel 101): phones 1 3
    a1 = f.add_state()
    f.add_arc(loop, Arc(1, 100, 0.4, a1))
    f.add_arc(a1, Arc(2, EPS, 0.0, loop))
    b1 = f.add_state()
    f.add_arc(loop, Arc(1, 101, 0.7, b1))
    f.add_arc(b1, Arc(3, EPS, 0.0, loop))
    d = determinize_star(f)
    for s in range(d.num_states):
        labels = [a.ilabel for a in d.arcs[s] if a.ilabel != EPS]
        assert len(labels) == len(set(labels))
    assert rand_equivalent(f, d, num_paths=50, seed=3)


# ---------------------------------------------------------------------------
# push / reverse (fstpush / fstreverse roles)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(6))
def test_push_weights_preserves_language_and_normalizes(seed):
    from kaldi_tpu.fst.ops import push_weights, rand_equivalent
    rng = random.Random(100 + seed)
    f = rand_acyclic_fst(rng, num_states=12, num_arcs=26)
    if f.start < 0:
        return
    p = push_weights(f)
    assert rand_equivalent(f, p, num_paths=40, seed=seed)
    # every state's cheapest continuation is now 0 (up to the start
    # state's constant shift)
    from kaldi_tpu.fst.fst import INF
    for s in range(p.num_states):
        opts = [a.weight for a in p.arcs[s]]
        fw = p.final(s)
        if fw != INF:
            opts.append(fw)
        if not opts:
            continue
        base = min(opts)
        if s != p.start:
            assert abs(base) < 1e-6, f"state {s} min weight {base}"


@pytest.mark.parametrize("seed", range(4))
def test_reverse_reverses_paths(seed):
    from kaldi_tpu.fst.ops import reverse, shortest_path
    rng = random.Random(200 + seed)
    f = rand_acyclic_fst(rng, num_states=10, num_arcs=22, eps_prob=0.0)
    if f.start < 0:
        return
    r = reverse(f)
    arcs_f, cost_f = shortest_path(f)
    arcs_r, cost_r = shortest_path(r)
    assert cost_r == pytest.approx(cost_f, abs=1e-6)
    labs_f = [a.ilabel for a in arcs_f if a.ilabel]
    labs_r = [a.ilabel for a in arcs_r if a.ilabel]
    assert labs_r == labs_f[::-1]
