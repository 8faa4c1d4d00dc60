"""Streaming TDNN scoring vs the offline forward (the
decodable-online-looped contract: chunked == offline within the
receptive field)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
from kaldi_tpu.decoder.online_nnet import OnlineNnetScorer


@pytest.mark.parametrize("chunk", [9, 30, 75])
def test_streaming_scores_match_offline(rng, chunk):
    cfg = TdnnConfig(feat_dim=8, num_pdfs=10, hidden_dim=16,
                     bottleneck_dim=8, num_layers=3,
                     frame_subsampling_factor=3)
    model = TdnnChain(cfg)
    T, D = 150, 8
    feats = rng.standard_normal((T, D)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), feats[None], train=False)

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    offline = np.asarray(apply_fn(feats[None])[0])

    # receptive field of 3 layers with strides (1,1,1) + input splice:
    # small; use generous context
    sc = OnlineNnetScorer(apply_fn, left_context=24, right_context=24)
    outs = []
    for i in range(0, T, chunk):
        sc.accept_features(feats[i:i + chunk])
        got = sc.read_new()
        if got.size:
            outs.append(got)
    sc.input_finished()
    got = sc.read_new()
    if got.size:
        outs.append(got)
    streamed = np.concatenate(outs)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=1e-3, atol=1e-3)


def test_streaming_decode_with_online_scorer(rng):
    """End-to-end: streaming TDNN scores through the streaming decoder
    equal the offline decode."""
    from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, \
        TransitionModel
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.decoder.online import SingleUtteranceDecoder
    from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
        make_unigram_arpa, mkgraph

    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words), self_loop_scale=1.0)

    cfg = TdnnConfig(feat_dim=6, num_pdfs=tree.num_pdfs, hidden_dim=16,
                     bottleneck_dim=8, num_layers=2,
                     frame_subsampling_factor=3)
    model = TdnnChain(cfg)
    T = 120
    feats = rng.standard_normal((T, 6)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), feats[None], train=False)

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    offline_scores = np.asarray(apply_fn(feats[None])[0])
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=1.0))
    ref = dec.decode(offline_scores)

    online = SingleUtteranceDecoder(dec, chunk_frames=8)
    sc = OnlineNnetScorer(apply_fn, left_context=24, right_context=24)
    for i in range(0, T, 25):
        sc.accept_features(feats[i:i + 25])
        s = sc.read_new()
        if s.size:
            online.advance_decoding(s)
    sc.input_finished()
    s = sc.read_new()
    if s.size:
        online.advance_decoding(s)
    tids, ols, cost = online.get_best_path(use_final_probs=True)
    assert tids == ref[0]
    assert ols == ref[1]
    assert abs(cost - ref[2]) < 1e-2
