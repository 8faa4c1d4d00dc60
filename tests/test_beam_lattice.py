"""BeamDecoder lattice generation + biglang direct graph construction.

Oracles (the reference's decoder test strategy, SURVEY.md §4):
  * exhaustive path enumeration over the graph — the pruned raw
    lattice must contain EVERY path within lattice_beam of the best,
    at its exact cost (LatticeFasterDecoder's documented contract)
  * the generic mkgraph pipeline (compose → determinize-star →
    minimize) as graph-construction oracle for build_big_graph
  * SimpleDecoder as best-path oracle at mid scale
"""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, \
    TransitionModel
from kaldi_tpu.decoder import SimpleDecoder
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
    make_unigram_arpa, mkgraph
from kaldi_tpu.fst.arpa import estimate_arpa
from kaldi_tpu.fst.biglang import build_big_graph, make_symbol_tables
from kaldi_tpu.fst.csr import csr_to_vector_fst, pack_fst


@pytest.fixture(scope="module")
def small_graph():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                   self_loop_scale=1.0)
    return lang, tm, pack_fst(HCLG)


def _all_paths(csr, loglikes, scale, eps_bound=8):
    """Exhaustive (tids, words) → min cost over all graph paths."""
    T = loglikes.shape[0]
    out = {}

    def go(state, t, depth, tids, words, cost):
        if t == T:
            f = csr.final_costs[state]
            if np.isfinite(f):
                key = (tuple(tids), tuple(words))
                c = cost + f
                if c < out.get(key, np.inf):
                    out[key] = c
            # ε continues even at the end (backoff to final states)
        if depth < eps_bound:
            for i in range(csr.n_offsets[state], csr.n_offsets[state + 1]):
                go(int(csr.n_nextstate[i]), t, depth + 1, tids,
                   words + ([int(csr.n_olabel[i])]
                            if csr.n_olabel[i] else []),
                   cost + float(csr.n_weight[i]))
        if t < T:
            for i in range(csr.e_offsets[state], csr.e_offsets[state + 1]):
                il = int(csr.e_ilabel[i])
                go(int(csr.e_nextstate[i]), t + 1, 0, tids + [il],
                   words + ([int(csr.e_olabel[i])]
                            if csr.e_olabel[i] else []),
                   cost + float(csr.e_weight[i]) - scale * loglikes[t][
                       _pdf_of(il)])

    global _pdf_of
    go(csr.start, 0, 0, [], [], 0.0)
    return out


def _lattice_paths(lat):
    """(tids, words) → min cost over lattice paths."""
    out = {}

    def go(s, tids, words, cost):
        if s in lat.finals:
            gc, ac = lat.finals[s]
            key = (tuple(tids), tuple(words))
            c = cost + gc + ac
            if c < out.get(key, np.inf):
                out[key] = c
        for a in lat.arcs[s]:
            go(a.nextstate,
               tids + ([a.ilabel] if a.ilabel else []),
               words + ([a.olabel] if a.olabel else []),
               cost + a.total)

    go(lat.start, [], [], 0.0)
    return out


@pytest.mark.parametrize("seed", range(4))
def test_lattice_exact_within_beam(small_graph, seed):
    """Every graph path within lattice_beam of the best appears in the
    pruned raw lattice at its exact cost, and nothing cheaper exists."""
    lang, tm, csr = small_graph
    rng = np.random.default_rng(seed)
    T = 6
    ll = rng.standard_normal((T, tm.num_pdfs)).astype(np.float32)
    lb = 6.0
    dec = BeamDecoder(csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=1e9, max_active=csr.num_states, acoustic_scale=1.0,
        lattice_beam=lb, lattice_arcs_per_frame=4 * csr.num_states))
    lat = dec.decode_lattice(ll)

    global _pdf_of
    t2p = tm.tid_to_pdf_array
    _pdf_of = lambda il: t2p[il]
    truth = _all_paths(csr, ll, 1.0)
    best = min(truth.values())
    got = _lattice_paths(lat)
    assert abs(min(got.values()) - best) < 1e-3
    for key, c in truth.items():
        if c <= best + lb - 1e-3:
            assert key in got, f"path {key} (cost {c:.3f}) missing"
            assert abs(got[key] - c) < 1e-3
    for key, c in got.items():
        assert key in truth
        assert c >= truth[key] - 1e-3


def test_lattice_bestpath_matches_viterbi(small_graph):
    lang, tm, csr = small_graph
    rng = np.random.default_rng(11)
    ll = rng.standard_normal((20, tm.num_pdfs)).astype(np.float32)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=16.0, max_active=200, acoustic_scale=1.0,
        lattice_beam=7.0, lattice_arcs_per_frame=512))
    tids, ols, cost = dec.decode(ll)
    lat = dec.decode_lattice(ll)
    ltids, lwords, lcost = lat.best_path()
    assert abs(lcost - cost) < 1e-3
    assert ltids == tids
    assert lwords == ols


def _random_lexicon(rng, n_words, n_phones, maxlen=6):
    phones = [f"p{i:02d}" for i in range(n_phones)]
    entries = []
    seen = set()
    for i in range(n_words):
        L = int(rng.integers(2, maxlen + 1))
        pron = tuple(phones[int(k)] for k in rng.integers(0, n_phones, L))
        seen.add(pron)
        entries.append((f"w{i:04d}", list(pron)))
    return entries


def _corpus(rng, entries, n_sent):
    ws = [w for w, _ in entries]
    out = []
    for _ in range(n_sent):
        n = int(rng.integers(1, 8))
        out.append([ws[int(k)] for k in rng.integers(0, len(ws), n)])
    return out


def test_biglang_matches_mkgraph_trigram():
    """Direct large-graph construction is path-weight-equivalent to the
    generic compose/determinize/minimize pipeline."""
    rng = np.random.default_rng(5)
    entries = sorted(_random_lexicon(rng, 20, 4))
    texts = _corpus(rng, entries, 150)
    arpa = estimate_arpa(texts, order=3, prune_count=1,
                         vocab=[w for w, _ in entries])
    lex = Lexicon(list(entries))
    lang = Lang(lex)
    pl = lang.phone_list()
    topo = HmmTopology.chain(pl)
    tree = MonophoneContextDependency(pl, topo)
    tm = TransitionModel(topo, tree)
    csr_ref = pack_fst(mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                               self_loop_scale=1.0))
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    cfg = BeamDecoderConfig(beam=1e9, max_active=10 ** 9,
                            acoustic_scale=1.0)
    d_ref = BeamDecoder(csr_ref, tm.tid_to_pdf_array, cfg)
    d_big = BeamDecoder(big.csr, tm.tid_to_pdf_array, cfg)
    for seed in range(4):
        r2 = np.random.default_rng(100 + seed)
        T = int(r2.integers(5, 15))
        ll = (r2.standard_normal((T, tree.num_pdfs)) * 2).astype(np.float32)
        t1, o1, c1 = d_ref.decode(ll)
        t2, o2, c2 = d_big.decode(ll)
        assert abs(c1 - c2) < 1e-3
        assert o1 == o2


def test_biglang_midscale_beam_matches_simple():
    """2k-word graph: pruned beam decode finds the unpruned best path
    on separable inputs; lattice best path agrees."""
    rng = np.random.default_rng(9)
    entries = sorted(_random_lexicon(rng, 2000, 20))
    texts = _corpus(rng, entries, 800)
    vocab = [w for w, _ in entries]
    arpa = estimate_arpa(texts, order=2, prune_count=1, vocab=vocab)
    words, ptab = make_symbol_tables(entries)
    pl = [ptab[p] for p in sorted(
        {p for _, pron in entries for p in pron} | {"SIL"})]
    topo = HmmTopology.chain(pl)
    tree = MonophoneContextDependency(pl, topo)
    tm = TransitionModel(topo, tree)
    big = build_big_graph(entries, arpa, tm, words, ptab,
                          self_loop_scale=1.0)
    assert big.csr.num_states > 5000

    # synthetic "spoken" utterance: loglikes peaked on the true pdfs
    fst_obj = csr_to_vector_fst(big.csr)
    simple = SimpleDecoder(fst_obj, acoustic_scale=1.0)
    sent = texts[0][:4]
    pron_of = dict(entries)
    pdfs = []
    for w in sent:
        for p in pron_of[w]:
            window = [ptab[p]]
            st = topo.topology_for_phone(ptab[p])[0]
            fwd = tree.compute(window, st.forward_pdf_class)
            slf = tree.compute(window, st.self_loop_pdf_class)
            dur = int(rng.integers(2, 5))
            pdfs.extend([fwd] + [slf] * (dur - 1))
    T = len(pdfs)
    P = tree.num_pdfs
    ll = np.full((T, P), -8.0, np.float32)
    ll[np.arange(T), pdfs] = 0.0
    ll += 0.3 * rng.standard_normal((T, P)).astype(np.float32)

    ref = simple.decode(ll, tm.tid_to_pdf_array)
    dec = BeamDecoder(big.csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=14.0, max_active=2000, acoustic_scale=1.0,
        lattice_beam=7.0, lattice_arcs_per_frame=2048))
    tids, ols, cost = dec.decode(ll)
    assert abs(cost - ref[2]) < 1e-2
    assert ols == ref[1]
    hyp = [words.find(o) for o in ols]
    assert hyp == sent

    lat = dec.decode_lattice(ll)
    lw, ltids, lcost = lat.best_path()[1], None, lat.best_path()[2]
    assert abs(lcost - cost) < 1e-2


def test_eps_close_equivalent():
    """Transitive ε-closure (1 sweep/frame) decodes identically —
    best path AND lattice contents (on a biglang graph, which has
    completion + backoff ε chains of depth ≥ 2)."""
    from kaldi_tpu.fst.biglang import eps_close
    rng = np.random.default_rng(17)
    entries = sorted(_random_lexicon(rng, 15, 4))
    texts = _corpus(rng, entries, 120)
    arpa = estimate_arpa(texts, order=2, prune_count=1,
                         vocab=[w for w, _ in entries])
    lex = Lexicon(list(entries))
    lang = Lang(lex)
    pl = lang.phone_list()
    topo = HmmTopology.chain(pl)
    tree = MonophoneContextDependency(pl, topo)
    tm = TransitionModel(topo, tree)
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    csr = big.csr
    assert csr.num_sweeps >= 2
    closed = eps_close(csr)
    assert closed.num_sweeps == 1
    rng = np.random.default_rng(3)
    for seed in range(3):
        ll = rng.standard_normal((12, tm.num_pdfs)).astype(np.float32)
        cfg = BeamDecoderConfig(beam=1e9, max_active=csr.num_states,
                                acoustic_scale=1.0, lattice_beam=6.0,
                                lattice_arcs_per_frame=4 * csr.num_states)
        d1 = BeamDecoder(csr, tm.tid_to_pdf_array, cfg)
        d2 = BeamDecoder(closed, tm.tid_to_pdf_array, cfg)
        t1, o1, c1 = d1.decode(ll)
        t2, o2, c2 = d2.decode(ll)
        assert abs(c1 - c2) < 1e-3 and t1 == t2 and o1 == o2
        p1 = _lattice_paths(d1.decode_lattice(ll))
        p2 = _lattice_paths(d2.decode_lattice(ll))
        # identical well inside the lattice beam (paths at the exact
        # beam boundary may differ by float summation order)
        margin = 0.5
        best = min(p1.values())
        core1 = {k for k, c in p1.items() if c <= best + 6.0 - margin}
        core2 = {k for k, c in p2.items() if c <= best + 6.0 - margin}
        assert core1 == core2
        for k in core1:
            assert abs(p1[k] - p2[k]) < 1e-3


def test_native_lattice_matches_numpy(small_graph):
    """The C++ lattice builder (kaldi_tpu/native) must produce exactly
    the numpy reference pass's lattice."""
    import os
    from kaldi_tpu import native
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    lang, tm, csr = small_graph
    rng = np.random.default_rng(5)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=1e9, max_active=csr.num_states, acoustic_scale=1.0,
        lattice_beam=6.0, lattice_arcs_per_frame=4 * csr.num_states))
    for trial in range(3):
        ll = rng.standard_normal((10, tm.num_pdfs)).astype(np.float32)
        lat_native = dec.decode_lattice(ll)
        os.environ["KALDI_TPU_NO_NATIVE"] = "1"
        try:
            lat_numpy = dec.decode_lattice(ll)
        finally:
            del os.environ["KALDI_TPU_NO_NATIVE"]
        p1 = _lattice_paths(lat_native)
        p2 = _lattice_paths(lat_numpy)
        assert set(p1) == set(p2)
        for k in p1:
            assert abs(p1[k] - p2[k]) < 1e-4
        assert lat_native.num_states == lat_numpy.num_states
        assert lat_native.num_arcs == lat_numpy.num_arcs


def test_arc_budget_cutoff_prefers_best_tokens():
    """With a BINDING arc budget, the adaptive arc-budget cutoff must
    spend the budget on the cheapest tokens — so on separable inputs
    the unpruned best path still comes out, even though most of each
    frame's block demand is dropped."""
    rng = np.random.default_rng(3)
    entries = sorted(_random_lexicon(rng, 500, 14))
    texts = _corpus(rng, entries, 300)
    vocab = [w for w, _ in entries]
    arpa = estimate_arpa(texts, order=2, prune_count=1, vocab=vocab)
    words, ptab = make_symbol_tables(entries)
    pl = [ptab[p] for p in sorted(
        {p for _, pron in entries for p in pron} | {"SIL"})]
    topo = HmmTopology.chain(pl)
    tree = MonophoneContextDependency(pl, topo)
    tm = TransitionModel(topo, tree)
    big = build_big_graph(entries, arpa, tm, words, ptab,
                          self_loop_scale=1.0)

    fst_obj = csr_to_vector_fst(big.csr)
    simple = SimpleDecoder(fst_obj, acoustic_scale=1.0)
    sent = texts[0][:4]
    pron_of = dict(entries)
    pdfs = []
    for w in sent:
        for p in pron_of[w]:
            window = [ptab[p]]
            st = topo.topology_for_phone(ptab[p])[0]
            fwd = tree.compute(window, st.forward_pdf_class)
            slf = tree.compute(window, st.self_loop_pdf_class)
            dur = int(rng.integers(2, 5))
            pdfs.extend([fwd] + [slf] * (dur - 1))
    T = len(pdfs)
    P = tree.num_pdfs
    ll = np.full((T, P), -8.0, np.float32)
    ll[np.arange(T), pdfs] = 0.0
    ref = simple.decode(ll, tm.tid_to_pdf_array)

    # wide beam + many tokens, but a budget far below the demand that
    # beam implies: only the cost cutoff can keep the true path alive
    dec = BeamDecoder(big.csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=20.0, max_active=1500, acoustic_scale=1.0,
        arc_budget=2048, arc_block=4))
    tids, ols, cost = dec.decode(ll)
    raw = dec._decode_jit(dec._graph_arrays(),
                          np.asarray(ll, np.float32), np.int32(T))
    host = dec._fetch(raw)
    assert int(np.asarray(host["dropped_arcs"])) > 0, \
        "budget did not bind; tighten arc_budget"
    assert ols == ref[1]
    assert abs(cost - ref[2]) < 1e-2


def test_fused_compact_matches_two_stage(small_graph):
    """decode_compact (fused native build+determinize) must agree
    path-semantically with determinize_lattice_py(decode_lattice(..))."""
    from kaldi_tpu.lattice.determinize import determinize_lattice_py
    lang, tm, csr = small_graph
    rng = np.random.default_rng(23)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=16.0, max_active=200, acoustic_scale=1.0,
        lattice_beam=6.0, lattice_arcs_per_frame=512))
    for _ in range(3):
        ll = rng.standard_normal((12, tm.num_pdfs)).astype(np.float32)
        clat = dec.decode_compact(ll)
        ref = determinize_lattice_py(dec.decode_lattice(ll))
        got = {w: c for w, c in clat.paths()}
        want = {w: c for w, c in ref.paths()}
        assert set(got) == set(want)
        for w in want:
            assert abs(got[w] - want[w]) < 1e-3
        gw, gt, gc = clat.best_path()
        rw, rt, rc = ref.best_path()
        assert gw == rw and gt == rt and abs(gc - rc) < 1e-3


def test_with_overrides_matches_fresh_decoder(small_graph):
    """A with_overrides sibling (shared packed graph, wider budget)
    must be indistinguishable from a freshly constructed decoder at
    that budget — lattices path-identical, costs equal."""
    from kaldi_tpu.core.logging import KaldiError
    lang, tm, csr = small_graph
    rng = np.random.default_rng(41)
    tight = BeamDecoderConfig(beam=16.0, max_active=200,
                              acoustic_scale=1.0, lattice_beam=6.0,
                              arc_budget=64, arc_block=4,
                              lattice_arcs_per_frame=512)
    wide = BeamDecoderConfig(beam=16.0, max_active=200,
                             acoustic_scale=1.0, lattice_beam=6.0,
                             arc_budget=4096, arc_block=4,
                             lattice_arcs_per_frame=512)
    base = BeamDecoder(csr, tm.tid_to_pdf_array, tight)
    clone = base.with_overrides(arc_budget=4096)
    fresh = BeamDecoder(csr, tm.tid_to_pdf_array, wide)
    assert clone.M == fresh.M and clone.MB == fresh.MB
    for _ in range(3):
        ll = rng.standard_normal((10, tm.num_pdfs)).astype(np.float32)
        got = {w: c for w, c in clone.decode_compact(ll, bucket=1).paths()}
        want = {w: c for w, c in fresh.decode_compact(ll, bucket=1).paths()}
        assert set(got) == set(want) and got
        for w in want:
            assert abs(got[w] - want[w]) < 1e-4
        # the base (tight) decoder still works independently
        tids_b, ols_b, cost_b = base.decode(ll)
        tids_c, ols_c, cost_c = clone.decode(ll)
        assert cost_c <= cost_b + 1e-4   # wider budget never worse
    with pytest.raises(KaldiError):
        base.with_overrides(arc_block=8)
    with pytest.raises(KaldiError):
        base.with_overrides(token_capacity=64)
