"""Online i-vector + silence weighting integration into the streaming
pipeline (the round-1 gap: the pieces existed but the pipeline never
consumed them).

Contracts (online-ivector-feature.h):
  * streamed-in-chunks == streamed-in-one-shot feature matrices with
    i-vectors appended (the online-feature-test.cc pattern)
  * per-block i-vectors are causal re-estimates every ivector_period
  * silence weighting: revised frame weights change the estimate
    exactly as direct weighted extraction does
  * end-to-end: nnet scores on streamed i-vector features == offline
    scores on the same assembled matrix
"""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.ivector import (IvectorExtractor, OnlineIvectorEstimator,
                                  OnlineSilenceWeighting)
from kaldi_tpu.features import FrameExtractionOptions, Mfcc, MfccOptions
from kaldi_tpu.features.online import OnlineFeaturePipeline


def _extractor(rng, dim=13, n_gauss=8, ivec_dim=5):
    means = rng.standard_normal((n_gauss, dim)) * 2
    var = np.ones((n_gauss, dim))
    w = np.ones(n_gauss) / n_gauss
    return IvectorExtractor(means, var, w, ivec_dim)


def _pipe(ex):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
    return OnlineFeaturePipeline(
        Mfcc(opts), ivector_estimator=OnlineIvectorEstimator(ex),
        ivector_period=10)


@pytest.mark.parametrize("chunk", [500, 1600])
def test_streamed_ivector_features_match(rng, chunk):
    ex = _extractor(rng)
    wave = (rng.standard_normal(8000) * 100).astype(np.float32)

    one = _pipe(ex)
    one.accept_waveform(wave)
    one.input_finished()
    n = one.num_frames_ready()
    ref = one.get_frames(0, n)

    two = _pipe(ex)
    for i in range(0, len(wave), chunk):
        two.accept_waveform(wave[i:i + chunk])
    two.input_finished()
    assert two.num_frames_ready() == n
    got = two.get_frames(0, n)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # the appended block is the i-vector and actually varies over time
    ivecs = ref[:, -ex.ivector_dim:]
    assert ivecs.shape[1] == 5
    assert np.abs(ivecs[0] - ivecs[-1]).max() > 1e-6


def test_ivector_blocks_causal(rng):
    """Block k's i-vector equals direct extraction from the raw frames
    seen up to its boundary."""
    ex = _extractor(rng)
    pipe = _pipe(ex)
    wave = (rng.standard_normal(6000) * 100).astype(np.float32)
    pipe.accept_waveform(wave)
    pipe.input_finished()
    n = pipe.num_frames_ready()
    out = pipe.get_frames(0, n)
    raw = np.stack(pipe._frames)
    for block in range(len(pipe._ivectors)):
        boundary = (block + 1) * pipe.ivector_period
        direct = ex.extract_from_feats(raw[:boundary])
        np.testing.assert_allclose(pipe._ivectors[block], direct,
                                   rtol=1e-4, atol=1e-5)
        t = block * pipe.ivector_period
        np.testing.assert_allclose(out[t, -ex.ivector_dim:],
                                   pipe._ivectors[block], rtol=1e-5)


def test_silence_weighting_changes_estimate(rng):
    ex = _extractor(rng)
    est = OnlineIvectorEstimator(ex)
    feats = rng.standard_normal((40, 13)) * 2
    est.accept_frames(feats)
    iv_unweighted = est.ivector()
    # decoder says the first 20 frames were silence
    weights = np.concatenate([np.zeros(20), np.ones(20)])
    est.update_frame_weights(weights)
    iv_weighted = est.ivector()
    # must equal direct weighted extraction
    direct = ex.extract(*ex.acc_stats(feats, weights=weights))
    np.testing.assert_allclose(iv_weighted, direct, rtol=1e-6, atol=1e-8)
    assert np.abs(iv_weighted - iv_unweighted).max() > 1e-6
    # restoring the weights restores the estimate (delta updates exact)
    est.update_frame_weights(np.ones(40))
    np.testing.assert_allclose(est.ivector(), iv_unweighted,
                               rtol=1e-6, atol=1e-8)


def test_silence_weighting_from_traceback(rng):
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    phones = [1, 2, 3]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    sil = {1}
    # build a tid traceback: phone 1 (silence) then phone 2
    def tids_for(phone, dur):
        st = topo.topology_for_phone(phone)[0]
        window = [phone]
        fwd = tree.compute(window, st.forward_pdf_class)
        slf = tree.compute(window, st.self_loop_pdf_class)
        ts = tm.tuple_to_transition_state(phone, 0, fwd, slf)
        fwd_tid = [tm.pair_to_transition_id(ts, i)
                   for i, (ns, _) in enumerate(st.transitions) if ns != 0][0]
        self_tid = tm.self_loop_of(ts)
        return [fwd_tid] + [self_tid] * (dur - 1)

    tb = tids_for(1, 4) + tids_for(2, 6)
    sw = OnlineSilenceWeighting(tm, sil, silence_weight=0.1)
    w = sw.compute_weights(tb, 12)
    np.testing.assert_allclose(w[:4], 0.1)
    np.testing.assert_allclose(w[4:10], 1.0)
    np.testing.assert_allclose(w[10:], 1.0)   # undecoded frames default


def test_streamed_scores_with_ivectors(rng):
    """End-to-end: streamed nnet scoring over i-vector-appended features
    equals offline scoring of the full assembled matrix."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer

    ex = _extractor(rng)
    pipe = _pipe(ex)
    wave = (rng.standard_normal(9600) * 100).astype(np.float32)
    pipe.accept_waveform(wave)
    pipe.input_finished()
    n = pipe.num_frames_ready()
    feats = pipe.get_frames(0, n)
    D = feats.shape[1]

    cfg = TdnnConfig(feat_dim=D, num_pdfs=6, hidden_dim=16,
                     bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    model = TdnnChain(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 12, D)), train=False)
    apply_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    offline = np.asarray(apply_fn(feats[None])[0])

    scorer = OnlineNnetScorer(apply_fn, left_context=12, right_context=12,
                              subsample=3)
    # stream features through in chunks, as the online decoder would
    pipe2 = _pipe(ex)
    emitted = 0
    chunks = []
    for i in range(0, len(wave), 1600):
        pipe2.accept_waveform(wave[i:i + 1600])
        ready = pipe2.num_frames_ready()
        if ready > emitted:
            scorer.accept_features(pipe2.get_frames(emitted, ready))
            emitted = ready
        chunks.append(scorer.read_new())
    pipe2.input_finished()
    ready = pipe2.num_frames_ready()
    if ready > emitted:
        scorer.accept_features(pipe2.get_frames(emitted, ready))
    scorer.input_finished()
    chunks.append(scorer.read_new())
    got = np.concatenate([c for c in chunks if c.size], axis=0)
    # offline subsampling h[:, ::3] emits ceil(T/3) frames, the scorer
    # floor(T/3) — compare the common prefix
    assert got.shape[0] >= offline.shape[0] - 1
    np.testing.assert_allclose(got, offline[:got.shape[0]],
                               rtol=1e-3, atol=1e-3)
