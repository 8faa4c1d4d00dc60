"""DenseDecoder (gather-based fast path) vs SimpleDecoder oracle."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.decoder import SimpleDecoder
from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig, pack_reverse
from kaldi_tpu.fst import (
    ArpaModel,
    Lang,
    Lexicon,
    arpa_to_fst,
    make_unigram_arpa,
    mkgraph,
)


@pytest.fixture(scope="module")
def graph():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words))
    return lang, tm, HCLG


@pytest.mark.parametrize("seed", range(5))
def test_dense_matches_simple(graph, seed):
    lang, tm, HCLG = graph
    rng = np.random.default_rng(seed)
    ll = rng.standard_normal((40, tm.num_pdfs)).astype(np.float32)
    ref = SimpleDecoder(HCLG, acoustic_scale=0.1).decode(
        ll, tm.tid_to_pdf_array)
    dec = DenseDecoder(pack_reverse(HCLG), tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    tids, ols, cost = dec.decode(ll)
    assert abs(cost - ref[2]) < 1e-3
    assert tids == ref[0]
    assert ols == ref[1]


def test_dense_batch(graph):
    lang, tm, HCLG = graph
    rng = np.random.default_rng(7)
    dec = DenseDecoder(pack_reverse(HCLG), tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    simple = SimpleDecoder(HCLG, acoustic_scale=0.1)
    T_pad, P = 48, tm.num_pdfs
    lls, lens, refs = [], [], []
    for T in [48, 21, 9]:
        ll = rng.standard_normal((T, P)).astype(np.float32)
        refs.append(simple.decode(ll, tm.tid_to_pdf_array))
        pad = np.zeros((T_pad, P), np.float32)
        pad[:T] = ll
        lls.append(pad)
        lens.append(T)
    for got, ref in zip(dec.decode_batch(np.stack(lls), np.array(lens)), refs):
        assert got[0] == ref[0]
        assert got[1] == ref[1]
        assert abs(got[2] - ref[2]) < 1e-3


def test_dense_beam_pruning_still_decodes(graph):
    lang, tm, HCLG = graph
    rng = np.random.default_rng(3)
    ll = rng.standard_normal((30, tm.num_pdfs)).astype(np.float32)
    dec = DenseDecoder(pack_reverse(HCLG), tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=8.0, acoustic_scale=0.1))
    tids, ols, cost = dec.decode(ll)
    assert len(tids) == 30
    assert np.isfinite(cost)
