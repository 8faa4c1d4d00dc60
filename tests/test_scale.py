"""Medium-scale sanity: a 500-word task end to end through graph build
and decode, pruned beam vs the unpruned oracle."""

import numpy as np
import pytest

from bench import build_task
from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig, \
    pack_reverse
from kaldi_tpu.decoder.simple import SimpleDecoder


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
