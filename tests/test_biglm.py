"""Big-LM on-the-fly composition decoding (decoder/biglm.py): decoding
a small-LM HCLG with the difference LM == decoding the big-LM HCLG
directly (SimpleDecoder oracle)."""

import numpy as np
import pytest

from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.decoder.biglm import BiglmDecoderConfig, BiglmFasterDecoder
from kaldi_tpu.decoder.simple import SimpleDecoder
from kaldi_tpu.fst import (ArpaModel, Lang, arpa_to_fst,
                           make_unigram_arpa, mkgraph)
from kaldi_tpu.fst.arpa import estimate_arpa
from kaldi_tpu.fst.lang import Lexicon


@pytest.fixture
def task():
    lex = Lexicon([("ONE", ["w", "n"]), ("TWO", ["t", "u"]),
                   ("NINE", ["n", "ai", "n"])])
    lang = Lang(lex)
    tm = TransitionModel(
        HmmTopology.three_state(lang.phone_list()),
        MonophoneContextDependency(
            lang.phone_list(),
            HmmTopology.three_state(lang.phone_list())))
    small = ArpaModel.parse(make_unigram_arpa(
        {"ONE": 1.0, "TWO": 1.0, "NINE": 1.0}))
    texts = [["ONE", "TWO"], ["TWO", "NINE"], ["NINE", "NINE"],
             ["ONE", "TWO", "NINE"], ["TWO", "NINE", "ONE"]]
    big = estimate_arpa(texts, order=2)
    if isinstance(big, str):
        big = ArpaModel.parse(big)
    return lang, tm, small, big


def test_biglm_equals_direct_big_graph(task):
    lang, tm, small, big = task
    HCLG_small = mkgraph(lang, tm, arpa_to_fst(small, lang.words))
    HCLG_big = mkgraph(lang, tm, arpa_to_fst(big, lang.words))
    rng = np.random.default_rng(0)
    P = tm.num_pdfs
    cfg = BiglmDecoderConfig(beam=1e9, max_active=10 ** 9,
                             acoustic_scale=0.2, history_len=1)
    dec = BiglmFasterDecoder(HCLG_small, tm.tid_to_pdf_array,
                             small.score, big.score, lang.words, cfg)
    oracle = SimpleDecoder(HCLG_big, acoustic_scale=0.2)
    for trial in range(4):
        T = 24 + 6 * trial
        ll = rng.standard_normal((T, P)).astype(np.float32) * 2.0
        tids, ols, cost = dec.decode(ll)
        tids_o, ols_o, cost_o = oracle.decode(ll, tm.tid_to_pdf_array)
        assert cost == pytest.approx(cost_o, abs=1e-3)
        assert ols == ols_o


def test_biglm_prefers_big_lm_sequences(task):
    """With zero acoustics the decoder's best word path follows the
    big LM, not the small one."""
    lang, tm, small, big = task
    HCLG_small = mkgraph(lang, tm, arpa_to_fst(small, lang.words))
    cfg = BiglmDecoderConfig(beam=1e9, max_active=10 ** 9,
                             acoustic_scale=0.0, history_len=1)
    dec = BiglmFasterDecoder(HCLG_small, tm.tid_to_pdf_array,
                             small.score, big.score, lang.words, cfg)
    T = 18
    ll = np.zeros((T, tm.num_pdfs), np.float32)
    _, ols, _ = dec.decode(ll)
    wordseq = [lang.words.find(o) for o in ols]
    # under the bigram, "NINE NINE" / sequences seen in training win;
    # just assert the output is one of the trained bigram paths
    pairs = set(zip(wordseq, wordseq[1:]))
    trained = {("ONE", "TWO"), ("TWO", "NINE"), ("NINE", "NINE"),
               ("NINE", "ONE")}
    assert not pairs or pairs <= trained
