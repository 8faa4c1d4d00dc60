"""X-vector speaker-embedding tests (StatisticsPooling + recipe role)."""

import numpy as np
import pytest

from kaldi_tpu.am.xvector import (XvectorConfig, XvectorNet, extract_xvector,
                                  train_xvector)


def _speaker_corpus(rng, n_spk=6, utts_per_spk=8, D=10, T=60):
    """Speaker identity lives in the per-speaker channel offset; frames
    add shared 'content' noise — exactly what stats pooling averages
    out."""
    spk_off = 3.0 * rng.standard_normal((n_spk, D))
    feats, utt2spk = {}, {}
    for s in range(n_spk):
        for j in range(utts_per_spk):
            u = f"s{s}u{j}"
            feats[u] = (spk_off[s]
                        + rng.standard_normal((T, D))).astype(np.float32)
            utt2spk[u] = f"s{s}"
    return feats, utt2spk


def test_statistics_pooling_masked():
    import jax.numpy as jnp
    from kaldi_tpu.am.xvector import StatisticsPooling
    x = np.zeros((1, 4, 2), np.float32)
    x[0, :, 0] = [1, 3, 100, 100]
    x[0, :, 1] = [2, 2, 100, 100]
    mask = np.array([[1, 1, 0, 0]], np.float32)
    pool = StatisticsPooling()
    out = pool.apply({}, jnp.asarray(x), jnp.asarray(mask))
    out = np.asarray(out)[0]
    # mean of first two frames only
    np.testing.assert_allclose(out[:2], [2.0, 2.0], atol=1e-5)
    # std: feature 0 has std 1, feature 1 std ~0 (floored at sqrt(eps))
    assert abs(out[2] - 1.0) < 1e-4
    assert out[3] < 0.02


def test_xvector_separates_speakers(rng):
    feats, utt2spk = _speaker_corpus(rng)
    # train on 6 utts/spk, evaluate on the held-out 2
    train_u = {u for u in feats if int(u.split("u")[1]) < 6}
    cfg = XvectorConfig(feat_dim=10, hidden_dim=32, embed_dim=16,
                        contexts=((-1, 0, 1), (0,)))
    variables, model, spks = train_xvector(
        {u: feats[u] for u in train_u},
        {u: utt2spk[u] for u in train_u}, cfg,
        num_epochs=25, batch_size=16, chunk=32)
    embs = {u: extract_xvector(variables, model, feats[u])
            for u in feats if u not in train_u}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    same, diff = [], []
    keys = sorted(embs)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            (same if utt2spk[a] == utt2spk[b] else diff).append(
                cos(embs[a], embs[b]))
    assert np.mean(same) > np.mean(diff) + 0.15
    # ranking quality on held-out utterances
    auc = float((np.asarray(same)[:, None]
                 > np.asarray(diff)[None, :]).mean())
    assert auc > 0.85, auc


def test_xvector_plda_diarization(rng):
    """X-vectors feed the same PLDA+AHC backend as i-vectors."""
    from kaldi_tpu.am.ivector import Plda, diarize
    feats, utt2spk = _speaker_corpus(rng, n_spk=8, utts_per_spk=6)
    cfg = XvectorConfig(feat_dim=10, hidden_dim=32, embed_dim=16,
                        contexts=((-1, 0, 1), (0,)))
    variables, model, spks = train_xvector(feats, utt2spk, cfg,
                                           num_epochs=25, chunk=32)
    embs = {u: extract_xvector(variables, model, feats[u]) for u in feats}
    # PLDA on 6 speakers; diarize segments of the other 2
    train_spk = {f"s{k}" for k in range(6)}
    spk2emb = {}
    for u, e in embs.items():
        if utt2spk[u] in train_spk:
            spk2emb.setdefault(utt2spk[u], []).append(e)
    plda = Plda.train({s: np.stack(v) for s, v in spk2emb.items()})
    segs, truth = [], []
    for k, s in enumerate(("s6", "s7")):
        for u in sorted(embs):
            if utt2spk[u] == s:
                segs.append(embs[u])
                truth.append(k)
    labels = diarize(plda, np.stack(segs), max_clusters=2)
    truth = np.asarray(truth)
    agree = max(float((labels == truth).mean()),
                float((labels == 1 - truth).mean()))
    assert agree > 0.9, (labels.tolist(), truth.tolist())
