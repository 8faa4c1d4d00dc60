"""Decoder tests: the JAX beam decoder vs the unpruned NumPy oracle.

The validation strategy is the reference's own (SURVEY.md §4): on small
graphs, a wide-beam pruned decoder must match SimpleDecoder exactly."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.decoder import BeamDecoder, BeamDecoderConfig, SimpleDecoder
from kaldi_tpu.fst import (
    ArpaModel,
    Lang,
    Lexicon,
    arpa_to_fst,
    make_unigram_arpa,
    mkgraph,
)
from kaldi_tpu.fst.csr import pack_fst


@pytest.fixture(scope="module")
def yesno_graph():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    G = arpa_to_fst(arpa, lang.words)
    HCLG = mkgraph(lang, tm, G)
    return lang, tm, HCLG


def _random_loglikes(rng, T, P, favored=None, boost=5.0):
    ll = rng.standard_normal((T, P)).astype(np.float32)
    if favored is not None:
        for t, p in enumerate(favored):
            ll[t, p] += boost
    return ll


def test_csr_pack(yesno_graph):
    _, tm, HCLG = yesno_graph
    csr = pack_fst(HCLG)
    assert csr.num_states == HCLG.num_states
    assert csr.num_emitting_arcs + csr.num_eps_arcs == HCLG.num_arcs
    assert csr.eps_depth >= 0
    # every emitting ilabel is a valid tid
    assert csr.e_ilabel.min() >= 1
    assert csr.e_ilabel.max() <= tm.num_transition_ids


@pytest.mark.parametrize("seed", range(5))
def test_beam_matches_simple_random_loglikes(yesno_graph, seed):
    lang, tm, HCLG = yesno_graph
    rng = np.random.default_rng(seed)
    T = 40
    ll = _random_loglikes(rng, T, tm.num_pdfs)
    simple = SimpleDecoder(HCLG, acoustic_scale=0.1)
    ref_tids, ref_ols, ref_cost = simple.decode(ll, tm.tid_to_pdf_array)

    csr = pack_fst(HCLG)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=1e9, max_active=10 ** 9,
                                        acoustic_scale=0.1))
    tids, ols, cost = dec.decode(ll)
    assert abs(cost - ref_cost) < 1e-3
    assert tids == ref_tids
    assert ols == ref_ols


def test_beam_decodes_planted_word(yesno_graph):
    """Plant strong evidence for the pdf sequence of 'YES' and check the
    decoder returns it."""
    lang, tm, HCLG = yesno_graph
    # build the pdf sequence for SIL YES SIL with ~5 frames per state
    phones = [lang.phones["SIL"], lang.phones["Y"], lang.phones["EH"],
              lang.phones["S"], lang.phones["SIL"]]
    favored = []
    window = [0]
    for ph in phones:
        for state in range(3):
            window[0] = ph
            pdf = tm.tree.compute(window, state)
            favored.extend([pdf] * 5)
    rng = np.random.default_rng(0)
    ll = _random_loglikes(rng, len(favored), tm.num_pdfs, favored, boost=8.0)
    csr = pack_fst(HCLG)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=20.0, acoustic_scale=1.0))
    tids, ols, cost = dec.decode(ll)
    words = [lang.words.find(o) for o in ols]
    assert words == ["YES"]
    assert len(tids) == len(favored)  # one tid per frame
    # alignment decodes to the planted phone sequence
    ali_phones = tm.alignment_to_phones(tids)
    assert ali_phones == phones


def test_beam_narrow_still_finds_path(yesno_graph):
    lang, tm, HCLG = yesno_graph
    rng = np.random.default_rng(1)
    ll = _random_loglikes(rng, 30, tm.num_pdfs)
    csr = pack_fst(HCLG)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=8.0, max_active=6,
                                        acoustic_scale=0.1))
    tids, ols, cost = dec.decode(ll)
    assert len(tids) == 30
    assert np.isfinite(cost)


def test_beam_batch(yesno_graph):
    lang, tm, HCLG = yesno_graph
    rng = np.random.default_rng(2)
    csr = pack_fst(HCLG)
    dec = BeamDecoder(csr, tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=1e9, max_active=10 ** 9,
                                        acoustic_scale=0.1))
    simple = SimpleDecoder(HCLG, acoustic_scale=0.1)
    T_pad = 50
    lls, lens, refs = [], [], []
    for b, T in enumerate([50, 37, 12]):
        ll = _random_loglikes(rng, T, tm.num_pdfs)
        refs.append(simple.decode(ll, tm.tid_to_pdf_array))
        pad = np.zeros((T_pad, tm.num_pdfs), np.float32)
        pad[:T] = ll
        lls.append(pad)
        lens.append(T)
    results = dec.decode_batch(np.stack(lls), np.array(lens))
    for (tids, ols, cost), (rt, ro, rc) in zip(results, refs):
        assert abs(cost - rc) < 1e-3
        assert tids == rt
        assert ols == ro
