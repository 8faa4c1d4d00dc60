"""i-vector / VAD / PLDA tests with planted-speaker oracles."""

import numpy as np
import pytest

from kaldi_tpu.am.ivector import (
    IvectorExtractor,
    OnlineIvectorEstimator,
    Plda,
    VadEnergyOptions,
    compute_vad_energy,
)


def test_vad_energy(rng):
    T, D = 100, 10
    feats = rng.standard_normal((T, D)).astype(np.float32)
    feats[:, 0] = 0.0
    feats[40:60, 0] = 20.0      # loud segment
    vad = compute_vad_energy(feats)
    assert vad[45] == 1.0 and vad[10] == 0.0
    assert 15 <= vad.sum() <= 25


def _speaker_world(rng, n_spk=4, utts_per_spk=6, frames=200, D=8, K=3):
    """Synthetic speakers: shared UBM + per-speaker offset in a K-dim
    subspace — exactly the total-variability generative model."""
    G = 6
    ubm_means = rng.standard_normal((G, D)) * 4
    ubm_vars = 0.4 + 0.3 * rng.random((G, D))
    weights = np.ones(G) / G
    T_true = rng.standard_normal((G, D, K))
    data = {}
    for s in range(n_spk):
        w = rng.standard_normal(K) * 1.5
        utts = []
        for _ in range(utts_per_spk):
            comps = rng.integers(0, G, frames)
            x = (ubm_means[comps] + np.einsum("gdk,k->gd", T_true, w)[comps]
                 + np.sqrt(ubm_vars[comps]) * rng.standard_normal((frames, D)))
            utts.append(x)
        data[f"spk{s}"] = utts
    return ubm_means, ubm_vars, weights, data


def test_ivector_extraction_separates_speakers(rng):
    ubm_means, ubm_vars, weights, data = _speaker_world(rng)
    ex = IvectorExtractor(ubm_means, ubm_vars, weights, ivector_dim=3)
    stats = [ex.acc_stats(u) for utts in data.values() for u in utts]
    ex.train(stats, num_iters=3)

    ivs = {spk: np.stack([ex.extract_from_feats(u) for u in utts])
           for spk, utts in data.items()}
    # within-speaker distance << between-speaker distance
    within, between = [], []
    spks = sorted(ivs)
    for s in spks:
        m = ivs[s].mean(axis=0)
        within.extend(np.linalg.norm(ivs[s] - m, axis=1))
    for i in range(len(spks)):
        for j in range(i + 1, len(spks)):
            between.append(np.linalg.norm(ivs[spks[i]].mean(0)
                                          - ivs[spks[j]].mean(0)))
    assert np.mean(between) > 2.0 * np.mean(within)


def test_online_ivector_converges(rng):
    ubm_means, ubm_vars, weights, data = _speaker_world(rng, n_spk=1,
                                                        utts_per_spk=1,
                                                        frames=600)
    ex = IvectorExtractor(ubm_means, ubm_vars, weights, ivector_dim=3)
    utt = data["spk0"][0]
    offline = ex.extract_from_feats(utt)
    online = OnlineIvectorEstimator(ex)
    partials = []
    for i in range(0, 600, 100):
        online.accept_frames(utt[i:i + 100])
        partials.append(online.ivector())
    np.testing.assert_allclose(partials[-1], offline, atol=1e-6)
    # estimates stabilize (later partials closer to final)
    d_early = np.linalg.norm(partials[0] - offline)
    d_late = np.linalg.norm(partials[-2] - offline)
    assert d_late <= d_early + 1e-9


def test_plda_scoring(rng):
    ubm_means, ubm_vars, weights, data = _speaker_world(
        rng, n_spk=5, utts_per_spk=8)
    ex = IvectorExtractor(ubm_means, ubm_vars, weights, ivector_dim=3)
    ivs = {spk: np.stack([ex.extract_from_feats(u) for u in utts])
           for spk, utts in data.items()}
    train_ivs = {s: v[:5] for s, v in ivs.items()}
    plda = Plda.train(train_ivs)
    same, diff = [], []
    spks = sorted(ivs)
    for s in spks:
        enroll = ivs[s][:5].mean(axis=0)
        for t in spks:
            for test in ivs[t][5:]:
                score = plda.score(enroll, test, n_train=5)
                (same if s == t else diff).append(score)
    assert np.mean(same) > np.mean(diff) + 1.0
    # pairwise ranking quality (AUC): same-speaker trials must outscore
    # different-speaker trials almost always
    same_a = np.asarray(same)[:, None]
    diff_a = np.asarray(diff)[None, :]
    auc = float((same_a > diff_a).mean())
    assert auc > 0.9, auc


def test_agglomerative_cluster_exact():
    """Hand-built similarity matrix: {0,1} and {2,3} are mutually
    similar, cross scores far below threshold → exactly two clusters."""
    from kaldi_tpu.am.ivector import agglomerative_cluster
    S = np.array([[0, 5, -9, -9],
                  [5, 0, -9, -9],
                  [-9, -9, 0, 4],
                  [-9, -9, 4, 0]], float)
    labels = agglomerative_cluster(S, threshold=0.0)
    assert labels.tolist() == [0, 0, 1, 1]
    # max_clusters forces merges below threshold
    labels1 = agglomerative_cluster(S, threshold=0.0, max_clusters=1)
    assert labels1.tolist() == [0, 0, 0, 0]
    # min_clusters stops merging even above threshold
    labels4 = agglomerative_cluster(S, threshold=-100.0, min_clusters=4)
    assert sorted(labels4.tolist()) == [0, 1, 2, 3]


def test_diarization_recovers_speakers(rng):
    """PLDA + AHC diarization recovers planted speaker turns (purity 1.0
    up to label permutation on a well-separated world)."""
    from kaldi_tpu.am.ivector import diarize
    ubm_means, ubm_vars, weights, data = _speaker_world(
        rng, n_spk=6, utts_per_spk=10)
    ex = IvectorExtractor(ubm_means, ubm_vars, weights, ivector_dim=3)
    ivs = {spk: np.stack([ex.extract_from_feats(u) for u in utts])
           for spk, utts in data.items()}
    spks = sorted(ivs)
    # PLDA trained on 4 held-in speakers; diarize the other 2
    plda = Plda.train({s: ivs[s] for s in spks[:4]})
    segs, truth = [], []
    for k, s in enumerate(spks[4:]):
        for iv in ivs[s]:
            segs.append(iv)
            truth.append(k)
    segs = np.stack(segs)
    labels = diarize(plda, segs, threshold=0.0, max_clusters=2)
    truth = np.asarray(truth)
    assert len(set(labels.tolist())) == 2
    # purity up to permutation
    agree = max(float((labels == truth).mean()),
                float((labels == 1 - truth).mean()))
    assert agree > 0.9, (labels, truth)


def test_online_ivectors_batched_matches_streaming(rng):
    """The vectorized online_ivectors (egs/offline path) must agree
    with the frame-at-a-time OnlineIvectorEstimator at every period
    checkpoint, and converge toward the utterance-level estimate."""
    from kaldi_tpu.am.ivector import online_ivectors
    G, D, K, T = 8, 6, 3, 64
    ubm_m = rng.standard_normal((G, D)) * 3
    ubm_v = 0.5 + 0.2 * rng.random((G, D))
    w = np.ones(G) / G
    ex = IvectorExtractor(ubm_m, ubm_v, w, ivector_dim=K)
    x = (ubm_m[rng.integers(0, G, T)]
         + rng.standard_normal((T, D))).astype(np.float64)
    period = 10
    out = online_ivectors(ex, x, period=period, max_count=0.0)
    assert out.shape == (T, K)
    assert np.allclose(out[:period], 0.0)      # prior before any stats
    est = OnlineIvectorEstimator(ex)
    for t0 in range(0, T, period):
        # batched value for block [t0, t0+period) = estimate from
        # frames [0, t0) — the streaming estimator's state at t0
        np.testing.assert_allclose(
            out[t0], est.ivector() if t0 else np.zeros(K), atol=1e-6)
        est.accept_frames(x[t0:t0 + period])
    # full-utterance agreement at the end
    full = ex.extract_from_feats(x)
    np.testing.assert_allclose(est.ivector(), full, atol=1e-8)


def test_train_diag_ubm_recovers_clusters(rng):
    from kaldi_tpu.am.ivector import train_diag_ubm
    centers = np.array([[5.0, 0.0], [-5.0, 0.0], [0.0, 6.0]])
    X = np.concatenate([c + 0.3 * rng.standard_normal((400, 2))
                        for c in centers])
    rng.shuffle(X)
    m, v, w = train_diag_ubm([X], num_gauss=3, num_iters=10, seed=1)
    # every true center has a learned mean nearby
    for c in centers:
        assert np.min(np.linalg.norm(m - c, axis=1)) < 0.5
    assert np.all(w > 0.2)
