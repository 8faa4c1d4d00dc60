"""Graph-compilation tests: L, G, H, and the full HCLG pipeline.

The end-check mirrors how the reference validates graphs: paths through
HCLG must spell valid (word, phone, transition-id) triples — decode a
best path and verify olabels give the words and ilabels align back to
the lexicon's phones (SURVEY.md §3.2).
"""

import math

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.fst import (
    EPS,
    Arc,
    ArpaModel,
    Lang,
    Lexicon,
    VectorFst,
    arpa_to_fst,
    compose,
    make_unigram_arpa,
    mkgraph,
    shortest_path,
)
from kaldi_tpu.fst.hclg import add_self_loops, make_h_transducer


@pytest.fixture
def yesno_lang():
    lex = Lexicon(entries=[
        ("YES", ["Y", "EH", "S"]),
        ("NO", ["N", "OW"]),
    ])
    return Lang(lex, sil_phone="SIL", sil_prob=0.5)


@pytest.fixture
def yesno_model(yesno_lang):
    phones = yesno_lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    return topo, tree, tm


def test_lang_tables(yesno_lang):
    l = yesno_lang
    assert l.phones["<eps>"] == 0
    assert l.phones["SIL"] == 1
    assert "#0" in l.phones and "#1" in l.phones
    assert l.words["<eps>"] == 0
    assert "YES" in l.words and "NO" in l.words and "#0" in l.words


def test_lexicon_fst_accepts_pronunciation(yesno_lang):
    L = yesno_lang.L
    ph, w = yesno_lang.phones, yesno_lang.words
    # Compose L with a linear word acceptor for "YES NO"
    G = VectorFst()
    s = [G.add_state() for _ in range(3)]
    G.set_start(s[0])
    G.add_arc(s[0], Arc(w["YES"], w["YES"], 0.0, s[1]))
    G.add_arc(s[1], Arc(w["NO"], w["NO"], 0.0, s[2]))
    G.set_final(s[2], 0.0)
    LG = compose(L, G)
    path, cost = shortest_path(LG)
    phones = [a.ilabel for a in path if a.ilabel != EPS]
    assert phones == [ph["Y"], ph["EH"], ph["S"], ph["N"], ph["OW"]]
    words = [a.olabel for a in path if a.olabel != EPS]
    assert words == [w["YES"], w["NO"]]
    assert cost < float("inf")


def test_transition_model_basics(yesno_model):
    topo, tree, tm = yesno_model
    # 6 phones (SIL + Y EH S N OW) × 3 states × 2 transitions each
    assert tree.num_pdfs == 6 * 3
    assert tm.num_transition_ids == 6 * 3 * 2
    # every tid maps to a valid pdf; self-loop flags consistent
    for tid in range(1, tm.num_transition_ids + 1):
        pdf = tm.transition_id_to_pdf(tid)
        assert 0 <= pdf < tree.num_pdfs
    # each transition state has exactly one self-loop
    for ts in range(1, len(tm.tuples) + 1):
        slt = tm.self_loop_of(ts)
        assert slt > 0 and tm.is_self_loop(slt)


def test_transition_mle_update(yesno_model):
    _, _, tm = yesno_model
    counts = np.zeros(tm.num_transition_ids + 1)
    # make self-loops 3x more frequent than forward transitions
    for tid in range(1, tm.num_transition_ids + 1):
        counts[tid] = 30.0 if tm.is_self_loop(tid) else 10.0
    change = tm.mle_update(counts)
    assert change > 0  # moved away from the 0.5/0.5 prior
    for ts in range(1, len(tm.tuples) + 1):
        slt = tm.self_loop_of(ts)
        assert abs(math.exp(tm.get_log_prob(slt)) - 0.75) < 1e-4


def test_h_transducer_structure(yesno_lang, yesno_model):
    _, _, tm = yesno_model
    info = yesno_lang.mono_ilabel_info()
    Ha, disambig_tids = make_h_transducer(
        info, tm, yesno_lang.phone_disambig_start)
    # no self-loop tids on any arc
    for s in range(Ha.num_states):
        for a in Ha.arcs[s]:
            if 1 <= a.ilabel <= tm.num_transition_ids:
                assert not tm.is_self_loop(a.ilabel)
    assert len(disambig_tids) == len(yesno_lang.disambig_ids)


def test_mkgraph_end_to_end(yesno_lang, yesno_model):
    _, tree, tm = yesno_model
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    G = arpa_to_fst(arpa, yesno_lang.words)
    HCLG = mkgraph(yesno_lang, tm, G)
    assert HCLG.num_states > 0

    # Every input label is 0 or a valid tid.
    for s in range(HCLG.num_states):
        for a in HCLG.arcs[s]:
            assert 0 <= a.ilabel <= tm.num_transition_ids

    # There must be self-loops (HMM self-transitions).
    n_self = sum(1 for s in range(HCLG.num_states) for a in HCLG.arcs[s]
                 if a.nextstate == s and a.ilabel != 0)
    assert n_self > 0

    # Best path: decode its olabels to words and ilabels to phones.
    path, cost = shortest_path(HCLG)
    assert cost < float("inf")
    words = [a.olabel for a in path if a.olabel != EPS]
    assert all(yesno_lang.words.find(w) in ("YES", "NO") for w in words)
    tids = [a.ilabel for a in path if a.ilabel != EPS]
    phones = tm.alignment_to_phones(tids)
    # phones must spell the words' pronunciations (modulo optional SIL)
    pron = {"YES": ["Y", "EH", "S"], "NO": ["N", "OW"]}
    expect = []
    for wid in words:
        expect.extend(yesno_lang.phones[p] for p in pron[yesno_lang.words.find(wid)])
    got = [p for p in phones if p != yesno_lang.phones["SIL"]]
    assert got == expect


def test_arpa_score_and_fst():
    arpa_text = """
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.5\t<s>\t-0.3
-0.5\t</s>
-0.4\tA\t-0.2
-0.6\tB

\\2-grams:
-0.1\tA B
-0.2\tA </s>

\\end\\
"""
    m = ArpaModel.parse(arpa_text)
    assert m.order == 2
    # P(B | A) from the bigram
    assert abs(m.score(("A",), "B") - (-0.1 * math.log(10))) < 1e-9
    # P(A | B) backs off: bo(B)=0 + unigram A
    assert abs(m.score(("B",), "A") - (-0.4 * math.log(10))) < 1e-9

    from kaldi_tpu.fst.fst import SymbolTable
    words = SymbolTable.from_list(["<eps>", "A", "B", "#0", "<s>", "</s>"])
    G = arpa_to_fst(m, words)
    assert G.num_states >= 2
    # Best path through G should be a valid sentence with finite cost
    path, cost = shortest_path(G)
    assert cost < float("inf")


def test_pron_probs_bias_decoding():
    """lexiconp-style pronunciation probabilities must ride L: a word
    with two prons decodes to the SAME word either way, but the L arc
    costs differ by −log(prob) (make_lexicon_fst.pl --pron-probs)."""
    import math
    from kaldi_tpu.fst.lang import Lang, Lexicon
    lex = Lexicon(entries=[("AY", ["a"], 0.9), ("AY", ["b"], 0.1),
                           ("BEE", ["c"])])
    lang = Lang(lex)
    # find the first-arc costs of each pron in L
    costs = {}
    L = lang.L
    wid = lang.words["AY"]
    for s in range(L.num_states):
        for a in L.arcs[s]:
            if a.olabel == wid:
                costs[a.ilabel] = a.weight
    ca = costs[lang.phones["a"]]
    cb = costs[lang.phones["b"]]
    assert cb - ca == pytest.approx(math.log(0.9 / 0.1), abs=1e-4)


def test_position_dependent_phones_end_to_end():
    """prepare_lang's default _B/_E/_I/_S phones: inventory expands,
    mkgraph still compiles, and a peaked decode recovers the words."""
    import numpy as np
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst import (ArpaModel, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.lang import Lang, Lexicon
    lex = Lexicon(entries=[("GO", ["g", "o"]), ("ON", ["o", "n"]),
                           ("O", ["o"])])
    lang = Lang(lex, position_dependent=True)
    names = {lang.phones.find(p) for p in lang.phone_list()}
    assert {"g_B", "o_E", "o_B", "n_E", "o_S", "SIL"} <= names
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"GO": 1.0, "ON": 1.0, "O": 1.0})),
        lang.words))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=16.0,
                                          acoustic_scale=1.0))
    # synthesize loglikes peaked on GO's position-dependent pdfs
    pdfs = []
    for ph in ("g_B", "o_E"):
        pid = lang.phones[ph]
        for st in range(3):
            pdfs += [tree.compute([pid], st)] * 2
    ll = np.full((len(pdfs), tm.num_pdfs), -8.0, np.float32)
    for t, p in enumerate(pdfs):
        ll[t, p] = 0.0
    _tids, ols, _cost = dec.decode(ll)
    assert [lang.words.find(o) for o in ols] == ["GO"]
