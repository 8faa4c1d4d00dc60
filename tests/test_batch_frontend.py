"""Batched frontend vs the per-utterance reference computers."""

import numpy as np

from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    add_deltas,
)
from kaldi_tpu.features.batch import BatchedFrontend, GmmDecodableProvider
from kaldi_tpu.am.gmm import AmDiagGmm


def test_batched_mfcc_matches_single(rng):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0),
                       mel_opts=MelBanksOptions(num_bins=15), num_ceps=10)
    single = Mfcc(opts)
    batched = BatchedFrontend(opts)
    waves = (rng.standard_normal((3, 8000)) * 100).astype(np.float32)
    got = np.asarray(batched(waves))
    for b in range(3):
        ref = single.compute(waves[b])
        np.testing.assert_allclose(got[b], ref, rtol=1e-3, atol=1e-3)


def test_batched_deltas_match(rng):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
    batched = BatchedFrontend(opts, deltas=DeltaFeaturesOptions())
    single = Mfcc(opts)
    waves = (rng.standard_normal((2, 4800)) * 50).astype(np.float32)
    got = np.asarray(batched(waves))
    assert got.shape[2] == 13 * 3
    for b in range(2):
        ref = np.asarray(add_deltas(single.compute(waves[b])))
        np.testing.assert_allclose(got[b], ref, rtol=1e-3, atol=1e-3)


def test_decodable_provider(rng):
    opts = MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0))
    fe = BatchedFrontend(opts, deltas=DeltaFeaturesOptions())
    P, M, D = 11, 4, 39
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    provider = GmmDecodableProvider(fe, am)
    waves = (rng.standard_normal((2, 4800)) * 50).astype(np.float32)
    ll = np.asarray(provider(waves))
    assert ll.shape[0] == 2 and ll.shape[2] == P
    # oracle: per-utterance path
    feats = np.asarray(fe(waves))
    ref = np.asarray(am.loglikes(feats[0]))
    np.testing.assert_allclose(ll[0], ref, rtol=1e-3, atol=1e-3)
