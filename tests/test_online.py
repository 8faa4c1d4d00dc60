"""Online feature + streaming decoder tests.

The key contract is the reference's own (online-feature-test.cc):
streamed processing in arbitrary chunk sizes must equal the offline
computation on the full input."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
from kaldi_tpu.decoder.online import (
    SingleUtteranceDecoder,
    default_endpoint_rules,
)
from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    FrameExtractionOptions,
    Mfcc,
    MfccOptions,
    add_deltas,
)
from kaldi_tpu.features.online import OnlineFeaturePipeline
from kaldi_tpu.fst import (
    ArpaModel,
    Lang,
    Lexicon,
    arpa_to_fst,
    make_unigram_arpa,
    mkgraph,
)


@pytest.mark.parametrize("chunk", [37, 160, 1000])
def test_online_mfcc_matches_offline(rng, chunk):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
    mfcc = Mfcc(opts)
    wave = (rng.standard_normal(5000) * 100).astype(np.float32)
    offline = mfcc.compute(wave)

    pipe = OnlineFeaturePipeline(Mfcc(opts))
    for i in range(0, len(wave), chunk):
        pipe.accept_waveform(wave[i:i + chunk])
    pipe.input_finished()
    assert pipe.num_frames_ready() == offline.shape[0]
    got = pipe.get_frames(0, offline.shape[0])
    np.testing.assert_allclose(got, offline, rtol=1e-4, atol=1e-4)


def test_online_deltas_lag_and_match(rng):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
    mfcc = Mfcc(opts)
    wave = (rng.standard_normal(4000) * 100).astype(np.float32)
    offline = np.asarray(add_deltas(mfcc.compute(wave)))

    pipe = OnlineFeaturePipeline(Mfcc(opts), deltas=DeltaFeaturesOptions())
    pipe.accept_waveform(wave[:2000])
    ready_mid = pipe.num_frames_ready()
    raw_mid = len(pipe._frames)
    assert ready_mid == raw_mid - pipe.right_context  # lag by right ctx
    if ready_mid > 0:
        got_mid = pipe.get_frames(0, ready_mid)
    pipe.accept_waveform(wave[2000:])
    pipe.input_finished()
    got = pipe.get_frames(0, pipe.num_frames_ready())
    assert got.shape == offline.shape
    np.testing.assert_allclose(got, offline, rtol=1e-3, atol=1e-3)
    if ready_mid > 0:
        # frames far enough from the boundary must not change (except the
        # last right-context frames whose deltas used clamped edges)
        stable = max(0, ready_mid - pipe.right_context)
        np.testing.assert_allclose(got[:stable], got_mid[:stable],
                                   rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def graph():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words))
    return lang, tm, HCLG


@pytest.mark.parametrize("chunk", [7, 32])
def test_streaming_decoder_matches_batch(graph, chunk):
    lang, tm, HCLG = graph
    rng = np.random.default_rng(0)
    T = 50
    ll = rng.standard_normal((T, tm.num_pdfs)).astype(np.float32)
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    ref_tids, ref_ols, ref_cost = dec.decode(ll)

    online = SingleUtteranceDecoder(dec, chunk_frames=chunk)
    for i in range(0, T, 13):
        online.advance_decoding(ll[i:i + 13])
        # partial results must be available at any time
        tids, ols, cost = online.get_best_path()
        assert len(tids) == online.num_frames_decoded
    tids, ols, cost = online.get_best_path(use_final_probs=True)
    assert tids == ref_tids
    assert ols == ref_ols
    assert abs(cost - ref_cost) < 1e-3


def test_endpointing(graph):
    lang, tm, HCLG = graph
    rng = np.random.default_rng(1)
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=1.0))
    sil_phone = lang.phones["SIL"]
    online = SingleUtteranceDecoder(
        dec, chunk_frames=16, silence_phones={sil_phone}, trans_model=tm)
    # plant: YES then long silence
    phones = [lang.phones[p] for p in ["Y", "EH", "S"]]
    favored = []
    for ph in phones:
        for st in range(3):
            favored.extend([tm.tree.compute([ph], st)] * 4)
    favored.extend([tm.tree.compute([sil_phone], st)
                    for st in range(3) for _ in range(30)])
    ll = rng.standard_normal((len(favored), tm.num_pdfs)).astype(np.float32)
    for t, p in enumerate(favored):
        ll[t, p] += 10.0
    online.advance_decoding(ll[:20])
    assert not online.endpoint_detected()   # still in speech
    online.advance_decoding(ll[20:])
    assert online.trailing_silence_frames() >= 50
    assert online.endpoint_detected()       # >0.5s silence after speech
