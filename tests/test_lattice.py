"""Lattice generation + determinization tests.

Oracles (reference style, SURVEY.md §4):
  - the lattice best path must equal the Viterbi decoder's best path
  - the arc-level pruning criterion α+arc+β ≤ best+beam must hold for
    every kept arc (checked by DP, not path enumeration)
  - determinization preserves the set of word sequences and their best
    costs (src/lat/determinize-lattice-pruned-test.cc pattern) on small
    lattices
"""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
from kaldi_tpu.fst import (
    ArpaModel,
    Lang,
    Lexicon,
    arpa_to_fst,
    make_unigram_arpa,
    mkgraph,
)
from kaldi_tpu.lattice import determinize_lattice, prune_lattice

INF = float("inf")


@pytest.fixture(scope="module")
def setup():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1,
                                          lattice_beam=4.0))
    return lang, tm, HCLG, dec


def _dp_costs(lat):
    """(forward-best, backward-best) node cost arrays via DAG DP."""
    order = lat.top_order()
    n = lat.num_states
    fwd = [INF] * n
    fwd[lat.start] = 0.0
    for s in order:
        if fwd[s] == INF:
            continue
        for a in lat.arcs[s]:
            fwd[a.nextstate] = min(fwd[a.nextstate], fwd[s] + a.total)
    bwd = [INF] * n
    for s, (gc, ac) in lat.finals.items():
        bwd[s] = gc + ac
    for s in reversed(order):
        for a in lat.arcs[s]:
            bwd[s] = min(bwd[s], a.total + bwd[a.nextstate])
    return fwd, bwd


def _word_cost_map(lat, cap=30000):
    """word-seq → best cost by DFS with memo guard (small lattices)."""
    out = {}
    count = [0]

    def walk(s, words, cost):
        count[0] += 1
        assert count[0] < cap, "lattice too large for enumeration test"
        if s in lat.finals:
            gc, ac = lat.finals[s]
            key = tuple(words)
            tot = cost + gc + ac
            if tot < out.get(key, INF):
                out[key] = tot
        for a in lat.arcs[s]:
            walk(a.nextstate, words + ([a.olabel] if a.olabel else []),
                 cost + a.total)

    walk(lat.start, [], 0.0)
    return out


@pytest.mark.parametrize("seed", range(4))
def test_raw_lattice_best_path_and_pruning(setup, seed):
    lang, tm, HCLG, dec = setup
    rng = np.random.default_rng(seed)
    ll = rng.standard_normal((25, tm.num_pdfs)).astype(np.float32)
    ref_tids, ref_ols, ref_cost = dec.decode(ll)
    lat, best = dec.decode_lattice(ll)
    assert abs(best - ref_cost) < 1e-3
    tids, words, cost = lat.best_path()
    assert abs(cost - ref_cost) < 1e-3
    assert tids == ref_tids
    assert words == ref_ols
    # DP check of the pruning criterion on every kept arc/state
    fwd, bwd = _dp_costs(lat)
    bound = best + dec.config.lattice_beam + 0.1
    for s in range(lat.num_states):
        for a in lat.arcs[s]:
            if bwd[a.nextstate] < INF and fwd[s] < INF:
                assert fwd[s] + a.total + bwd[a.nextstate] <= bound


@pytest.mark.parametrize("seed", range(3))
def test_determinize_preserves_word_costs(setup, seed):
    lang, tm, HCLG, dec = setup
    rng = np.random.default_rng(100 + seed)
    ll = rng.standard_normal((8, tm.num_pdfs)).astype(np.float32)
    lat, best = dec.decode_lattice(ll)
    clat = determinize_lattice(lat)
    for s in range(clat.num_states):
        ws = [a.word for a in clat.arcs[s]]
        assert len(ws) == len(set(ws))
    raw = _word_cost_map(lat)
    det = {}
    for words, c in clat.paths():
        det[tuple(words)] = min(det.get(tuple(words), INF), c)
    assert set(det) == set(raw)
    for w in raw:
        assert abs(det[w] - raw[w]) < 1e-3
    words, tids, cost = clat.best_path()
    assert abs(cost - best) < 1e-3


def test_prune_lattice(setup):
    lang, tm, HCLG, dec = setup
    rng = np.random.default_rng(5)
    ll = rng.standard_normal((10, tm.num_pdfs)).astype(np.float32)
    lat, best = dec.decode_lattice(ll)
    clat = determinize_lattice(lat)
    pruned = prune_lattice(clat, beam=2.0)
    assert pruned.num_arcs <= clat.num_arcs
    w0, _, c0 = clat.best_path()
    w1, _, c1 = pruned.best_path()
    assert w0 == w1
    assert abs(c0 - c1) < 1e-3
    for words, c in pruned.paths(max_paths=20000):
        assert c <= c0 + 2.0 + 0.1


def test_determinize_pruned_retries_on_blowup():
    """determinize_lattice_pruned must survive a state blowup by
    pruning with halved beams (DeterminizeLatticePhonePrunedWrapper
    retry contract) and still contain the best path."""
    import numpy as np
    from kaldi_tpu.lattice.determinize import (determinize_lattice,
                                               determinize_lattice_pruned,
                                               prune_raw_lattice)
    from kaldi_tpu.lattice.lattice import Lattice, LatticeArc
    rng = np.random.default_rng(4)
    # a dense ambiguous sausage: T frames × K parallel word arcs per
    # step explodes word-sequence-determinization state count
    T, K = 10, 5
    lat = Lattice()
    states = [lat.add_state() for _ in range(T + 1)]
    lat.start = states[0]
    for t in range(T):
        for k in range(K):
            lat.arcs[states[t]].append(LatticeArc(
                1 + k, 1 + k, float(rng.random() * 0.1), 0.0,
                states[t + 1]))
    lat.set_final(states[T], 0.0, 0.0)
    # tiny max_states forces the blowup path
    clat = determinize_lattice_pruned(lat, lattice_beam=8.0,
                                      max_states=50)
    assert clat.num_states > 0
    # best path preserved exactly
    ref_words, _t, ref_cost = lat.best_path()[1], None, lat.best_path()[2]
    got_words, _tids, got_cost = clat.best_path()
    assert got_cost == pytest.approx(ref_cost, abs=1e-4)

    # prune_raw_lattice at beam 0 keeps only best-cost arcs
    pruned = prune_raw_lattice(lat, 0.0)
    assert pruned.num_arcs <= lat.num_arcs
    assert pruned.best_path()[2] == pytest.approx(ref_cost, abs=1e-6)
