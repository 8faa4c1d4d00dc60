"""Medium-scale sanity: a 500-word task end to end through graph build
and decode, pruned beam vs the unpruned oracle."""

import numpy as np
import pytest

from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig, \
    pack_reverse
from kaldi_tpu.decoder.simple import SimpleDecoder


def build_task(num_words=100, num_phones=20, seed=0):
    """Unigram GMM decode task (formerly bench.py's workload; the
    bench now runs the 20k-word largevocab task)."""
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
        make_unigram_arpa, mkgraph

    rng = np.random.default_rng(seed)
    phones = [f"P{i}" for i in range(num_phones)]
    entries = []
    for w in range(num_words):
        n = int(rng.integers(2, 5))
        pron = [phones[int(rng.integers(num_phones))] for _ in range(n)]
        entries.append((f"W{w}", pron))
    lex = Lexicon(entries=entries)
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa(
        {f"W{w}": 1.0 for w in range(num_words)}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words))
    P, M, D = tree.num_pdfs, 8, 39
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)) * 3,
                   0.5 + rng.random((P, M, D)))
    return lang, tm, am, HCLG


@pytest.fixture(scope="module")
def task():
    return build_task(num_words=500, num_phones=30)


def test_medium_graph_builds(task):
    lang, tm, am, HCLG = task
    assert HCLG.num_states > 1000
    assert HCLG.num_arcs > 3000
    for s in range(HCLG.num_states):
        for a in HCLG.arcs[s]:
            assert 0 <= a.ilabel <= tm.num_transition_ids


def test_medium_graph_decode_matches_oracle(task):
    lang, tm, am, HCLG = task
    rng = np.random.default_rng(0)
    ll = rng.standard_normal((50, tm.num_pdfs)).astype(np.float32)
    ref = SimpleDecoder(HCLG, acoustic_scale=0.1).decode(
        ll, tm.tid_to_pdf_array)
    g = pack_reverse(HCLG)
    dec = DenseDecoder(g, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    got = dec.decode(ll)
    assert got[0] == ref[0] and got[1] == ref[1]
    assert abs(got[2] - ref[2]) < 1e-3
    # realistic beam still matches on this graph
    dec13 = DenseDecoder(g, tm.tid_to_pdf_array,
                         DenseDecoderConfig(beam=13.0, acoustic_scale=0.1))
    got13 = dec13.decode(ll)
    assert abs(got13[2] - ref[2]) < 1e-3
