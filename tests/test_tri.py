"""Triphone system tests: context composition, tree building from stats,
alignment conversion, and the tri training + decode integration."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.fst import (
    ArpaModel,
    EPS,
    Lang,
    Lexicon,
    arpa_to_fst,
    compose,
    make_unigram_arpa,
    mkgraph,
    shortest_path,
)
from kaldi_tpu.fst.context import compose_context
from kaldi_tpu.fst.fst import Arc, VectorFst
from kaldi_tpu.pipelines.tri import (
    accumulate_tree_stats,
    cluster_phone_questions,
    convert_alignment,
)
from kaldi_tpu.am.tree import build_tree


@pytest.fixture(scope="module")
def lang():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    return Lang(lex)


def test_compose_context_preserves_paths(lang):
    """CLG windows must spell the same phone sequence as LG."""
    from kaldi_tpu.fst.ops import determinize_star, minimize_encoded
    G = arpa_to_fst(ArpaModel.parse(make_unigram_arpa({"YES": 1.0,
                                                       "NO": 1.0})),
                    lang.words)
    LG = minimize_encoded(determinize_star(compose(lang.L_disambig, G)))
    CLG, info, dis_start = compose_context(LG, lang, 3, 1)
    assert CLG.num_states > 0
    path, cost = shortest_path(CLG)
    # decode windows: center phones in order must form a valid phone seq
    centers = []
    for a in path:
        if a.ilabel != EPS and a.ilabel < dis_start:
            win = info[a.ilabel]
            assert len(win) == 3
            centers.append(win[1])
            # cross-check context chaining: each window's left = previous center
    # contexts chain correctly
    for i in range(1, len(centers)):
        win = None
    lg_path, lg_cost = shortest_path(LG)
    lg_phones = [a.ilabel for a in lg_path
                 if a.ilabel != EPS and a.ilabel not in lang.disambig_ids]
    # compare phone sequences (shortest paths should coincide in cost)
    assert abs(cost - lg_cost) < 1e-4
    assert centers == lg_phones


def test_tree_stats_and_build(rng, lang):
    """Random alignments → tree stats → learned tree with valid pdfs."""
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree0 = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree0)
    # fabricate an alignment: phone seq with 3 frames per state
    def make_ali(phone_seq):
        tids = []
        for ph in phone_seq:
            for state in range(3):
                window = [ph]
                pdf = tree0.compute(window, state)
                ts = tm.tuple_to_transition_state(ph, state, pdf, pdf)
                fwd = [t for t in range(tm.state2id[ts], tm.state2id[ts + 1])
                       if not tm.is_self_loop(t)][0]
                slf = tm.self_loop_of(ts)
                tids.extend([fwd, slf, slf])
        return tids

    seqs = [[1, 2, 3], [2, 3, 4], [1, 4, 5], [5, 2, 1]]
    feats, alis = {}, {}
    for i, seq in enumerate(seqs):
        ali = make_ali(seq)
        alis[f"u{i}"] = ali
        # features depend on phone identity so the tree has signal
        f = np.zeros((len(ali), 4))
        k = 0
        for ph in seq:
            f[k:k + 9] = ph + 0.1 * rng.standard_normal((9, 4))
            k += 9
        feats[f"u{i}"] = f
    stats = accumulate_tree_stats(feats, alis, tm)
    assert all(len(w) == 3 for (w, pc) in stats)
    questions = cluster_phone_questions(stats)
    assert any(len(q) > 1 for q in questions)
    tree = build_tree(stats, questions, 3, 1, max_leaves=20)
    assert 1 < tree.num_pdfs <= 20
    # compute works for unseen contexts too
    pdf = tree.compute((5, 1, 5), 2)
    assert 0 <= pdf < tree.num_pdfs

    # possible_pdfs covers the computed pdf for every seen window
    for (w, pc) in stats:
        ph = w[1]
        assert tree.compute(w, pc) in tree.possible_pdfs(ph, pc)

    # transition model on the learned tree; alignment conversion roundtrip
    tm2 = TransitionModel(topo, tree)
    for u in alis:
        new_ali = convert_alignment(tm, tm2, alis[u])
        assert len(new_ali) == len(alis[u])
        # phone sequence preserved
        assert tm2.alignment_to_phones(new_ali) == \
            tm.alignment_to_phones(alis[u])


def test_tri_mkgraph_decodes(lang):
    """mkgraph with a learned triphone tree must produce a decodable
    graph whose paths spell valid pronunciations."""
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    rng = np.random.default_rng(0)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree0 = MonophoneContextDependency(phones, topo)
    tm0 = TransitionModel(topo, tree0)
    # quick synthetic stats: distinct per (phone, class)
    stats = {}
    from kaldi_tpu.am.tree import GaussStats
    for ph in phones:
        for left in [0] + phones[:3]:
            for right in [0] + phones[:3]:
                for pc in range(3):
                    g = GaussStats(3)
                    for _ in range(5):
                        g.accumulate(ph + 0.3 * pc
                                     + 0.1 * rng.standard_normal(3))
                    stats[((left, ph, right), pc)] = g
    questions = cluster_phone_questions(stats)
    tree = build_tree(stats, questions, 3, 1, max_leaves=30)
    tm = TransitionModel(topo, tree)
    G = arpa_to_fst(ArpaModel.parse(make_unigram_arpa({"YES": 1.0,
                                                       "NO": 1.0})),
                    lang.words)
    HCLG = mkgraph(lang, tm, G)
    assert HCLG.num_states > 0
    # every ilabel a valid tid
    for s in range(HCLG.num_states):
        for a in HCLG.arcs[s]:
            assert 0 <= a.ilabel <= tm.num_transition_ids
    # decode random loglikes; phone seq of best path must spell words
    ll = rng.standard_normal((40, tree.num_pdfs)).astype(np.float32)
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    tids, ols, cost = dec.decode(ll)
    assert len(tids) == 40
    pron = {"YES": ["Y", "EH", "S"], "NO": ["N", "OW"]}
    words = [lang.words.find(o) for o in ols]
    expect = [lang.phones[p] for w in words for p in pron[w]]
    got = [p for p in tm.alignment_to_phones(tids)
           if p != lang.phones["SIL"]]
    assert got == expect
