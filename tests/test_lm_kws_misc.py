"""RNNLM, resample, pitch, and keyword-search tests."""

import math

import numpy as np
import pytest

from kaldi_tpu.features.pitch import PitchExtractionOptions, \
    compute_kaldi_pitch
from kaldi_tpu.features.resample import linear_resample
from kaldi_tpu.fst.fst import SymbolTable
from kaldi_tpu.kws import keyword_search, search_lattice
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
from kaldi_tpu.lm import RnnLmConfig, RnnLmScorer, train_rnnlm


def test_resample_preserves_tone():
    sf_in, sf_out, f0 = 16000, 8000, 440.0
    t = np.arange(16000) / sf_in
    wave = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    out = linear_resample(wave, sf_in, sf_out)
    assert abs(len(out) - 8000) <= 1
    # dominant frequency must stay 440 Hz
    spec = np.abs(np.fft.rfft(out[200:-200] * np.hanning(len(out) - 400)))
    peak = np.argmax(spec) * sf_out / (len(out) - 400)
    assert abs(peak - f0) < 5.0
    # amplitude roughly preserved
    assert 0.7 < np.abs(out[200:-200]).max() < 1.3


def test_pitch_tracks_tone(rng):
    sf, f0 = 8000, 200.0
    t = np.arange(8000) / sf
    wave = (np.sin(2 * np.pi * f0 * t)
            + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    out = compute_kaldi_pitch(wave, PitchExtractionOptions(samp_freq=sf))
    assert out.shape[1] == 2
    mid = out[5:-5]
    # pitch near 200 Hz on most voiced frames
    close = np.abs(mid[:, 1] - f0) < 10
    assert close.mean() > 0.8
    # high POV on the tone
    assert mid[:, 0].mean() > 0.5


def test_pitch_noise_low_pov(rng):
    sf = 8000
    wave = rng.standard_normal(8000).astype(np.float32)
    out = compute_kaldi_pitch(wave, PitchExtractionOptions(samp_freq=sf))
    tone = compute_kaldi_pitch(
        np.sin(2 * np.pi * 150 * np.arange(8000) / sf).astype(np.float32),
        PitchExtractionOptions(samp_freq=sf))
    assert out[:, 0].mean() < tone[:, 0].mean()


def test_rnnlm_learns_pattern():
    """Sentences always alternate 3,4,3,4...; the RNNLM must assign much
    higher probability to the continuation than an order-0 model."""
    cfg = RnnLmConfig(vocab_size=8, embed_dim=16, hidden_dim=32)
    sentences = [[3, 4, 3, 4], [3, 4], [3, 4, 3, 4, 3, 4]] * 5
    params, model = train_rnnlm(sentences, cfg, num_epochs=60,
                                learning_rate=1e-2)
    words = SymbolTable()
    words.add("<eps>", 0)
    words.add("<s>", 1)
    words.add("</s>", 2)
    words.add("A", 3)
    words.add("B", 4)
    scorer = RnnLmScorer(params, model, words)
    # after "A", "B" must be far more likely than "A"
    lp_b = scorer.score(("A",), "B")
    lp_a = scorer.score(("A",), "A")
    assert lp_b > lp_a + 1.0
    # after "A B A", "B" again
    lp_b2 = scorer.score(("A", "B", "A"), "B")
    assert lp_b2 > math.log(0.5)
    # scorer caches states: repeated scoring is consistent
    assert scorer.score(("A",), "B") == lp_b


def test_rnnlm_sampled_softmax_matches_full():
    """Importance-sampled training (the SamplingLm role) must learn the
    same structure as full softmax: on a 64-word vocab where only the
    3,4 alternation ever occurs, sampled-softmax (K=12) perplexity on
    held-out alternations must come close to the full-softmax model's."""
    from kaldi_tpu.lm.rnnlm import perplexity, unigram_proposal
    cfg = RnnLmConfig(vocab_size=64, embed_dim=16, hidden_dim=32)
    sentences = [[3, 4, 3, 4], [3, 4], [3, 4, 3, 4, 3, 4]] * 5
    heldout = [[3, 4, 3, 4]]
    q = unigram_proposal(sentences, 64)
    assert abs(float(q.sum()) - 1.0) < 1e-5 and q.min() > 0
    params_f, model = train_rnnlm(sentences, cfg, num_epochs=60,
                                  learning_rate=1e-2)
    params_s, _ = train_rnnlm(sentences, cfg, num_epochs=60,
                              learning_rate=1e-2, sample_k=12)
    ppl_f = perplexity(params_f, model, heldout)
    ppl_s = perplexity(params_s, model, heldout)
    # both must crush the uniform baseline (ppl 64) and be comparable
    assert ppl_f < 4.0
    assert ppl_s < max(2.0 * ppl_f, 6.0)


def test_rnnlm_rescoring_flips_lattice():
    """Rescoring with the pattern-trained RNNLM must prefer A B over A A."""
    from kaldi_tpu.lattice import compose_lm, nbest
    cfg = RnnLmConfig(vocab_size=8, embed_dim=16, hidden_dim=32)
    params, model = train_rnnlm([[3, 4], [3, 4, 3, 4]] * 8, cfg,
                                num_epochs=60, learning_rate=1e-2)
    words = SymbolTable()
    for sym, i in [("<eps>", 0), ("<s>", 1), ("</s>", 2), ("A", 3), ("B", 4)]:
        words.add(sym, i)
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(3, 0.0, 0.0, (9,), s[1]))
    # acoustically "A A" is slightly better than "A B"
    c.arcs[s[1]].append(CompactArc(3, 0.0, 0.0, (9,), s[2]))
    c.arcs[s[1]].append(CompactArc(4, 0.3, 0.0, (9,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    assert nbest(c, 1)[0][0] == [3, 3]
    scorer = RnnLmScorer(params, model, words)
    resc = compose_lm(c, scorer.score, words, scale=1.0)
    assert nbest(resc, 1)[0][0] == [3, 4]


def test_keyword_search():
    """Keyword in a 2-branch lattice gets the branch posterior."""
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    # branch 1: words 5 6 (cost 0); branch 2: words 7 6 (cost 1)
    c.arcs[s[0]].append(CompactArc(5, 0.0, 0.0, (1, 2), s[1]))
    c.arcs[s[0]].append(CompactArc(7, 1.0, 0.0, (3,), s[1]))
    c.arcs[s[1]].append(CompactArc(6, 0.0, 0.0, (4,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    res = search_lattice(c, [5, 6])
    assert len(res) == 1
    b, e, post = res[0]
    expect = 1.0 / (1.0 + math.exp(-1.0))
    assert abs(post - expect) < 1e-6
    assert b == 0 and e >= 3
    # single-word keyword on the common suffix → posterior 1
    res6 = search_lattice(c, [6])
    assert len(res6) >= 1
    assert abs(sum(p for _, _, p in res6) - 1.0) < 1e-6
    # absent keyword
    assert search_lattice(c, [9]) == []
    # top-level API
    hits = keyword_search({"utt1": c}, {"kw1": [5, 6], "kw2": [9]})
    assert len(hits["kw1"]) == 1 and hits["kw1"][0].utt == "utt1"
    assert hits["kw2"] == []


def test_lattice_index_matches_direct_search():
    """LatticeIndex (factor-transducer role) must return exactly what
    the direct per-lattice search returns — hits, times, posteriors —
    on a collection with branches, ε arcs, and multi-word keywords."""
    from kaldi_tpu.kws import LatticeIndex
    lats = {}
    # lattice 1: the 2-branch fixture
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(5, 0.0, 0.0, (1, 2), s[1]))
    c.arcs[s[0]].append(CompactArc(7, 1.0, 0.0, (3,), s[1]))
    c.arcs[s[1]].append(CompactArc(6, 0.0, 0.0, (4,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    lats["u1"] = c
    # lattice 2: ε arc between the two keyword words
    d = CompactLattice()
    t = [d.add_state() for _ in range(4)]
    d.start = t[0]
    d.arcs[t[0]].append(CompactArc(5, 0.2, 0.1, (1,), t[1]))
    d.arcs[t[1]].append(CompactArc(0, 0.4, 0.0, (2,), t[2]))  # ε
    d.arcs[t[1]].append(CompactArc(6, 0.9, 0.0, (8,), t[3]))  # direct
    d.arcs[t[2]].append(CompactArc(6, 0.3, 0.2, (3,), t[3]))
    d.finals[t[3]] = (0.1, 0.0, ())
    lats["u2"] = d
    idx = LatticeIndex.build(lats)
    for kw in ([5, 6], [6], [5], [7, 6], [9], [5, 9]):
        direct = []
        for utt in sorted(lats):
            for b, e, p in search_lattice(lats[utt], kw):
                direct.append((utt, b, e, p))
        got = sorted([(h.utt, h.begin_frame, h.end_frame, h.posterior)
                      for h in idx.search(kw)])
        assert len(got) == len(direct), (kw, got, direct)
        for g, dd in zip(got, sorted(direct)):
            assert g[:3] == dd[:3], (kw, g, dd)
            assert abs(g[3] - dd[3]) < 1e-9, (kw, g, dd)
    # search_all API shape
    res = idx.search_all({"k1": [5, 6], "k2": [9]})
    assert res["k1"] and not res["k2"]


def test_pitch_accuracy_sweep(rng):
    """Accuracy pinning: a sawtooth sweeping 140→260 Hz must be tracked
    within 0.5% median relative error (parabolic lag interpolation —
    integer lags alone quantize at ~1.2% around 200 Hz / 16 kHz)."""
    sf = 16000.0
    dur = 1.2
    t = np.arange(int(sf * dur)) / sf
    f0 = 140.0 + (260.0 - 140.0) * t / dur
    phase = 2 * np.pi * np.cumsum(f0) / sf
    # sawtooth (harmonic-rich, like glottal pulses)
    wave = 2 * ((phase / (2 * np.pi)) % 1.0) - 1.0
    wave += 0.01 * rng.standard_normal(len(wave))
    out = compute_kaldi_pitch(wave, PitchExtractionOptions(samp_freq=sf))
    shift = int(sf * 0.010)
    true_f0 = np.array([f0[i * shift:i * shift + 400].mean()
                        for i in range(len(out))])
    rel = np.abs(out[:, 1] - true_f0) / true_f0
    assert np.median(rel) < 0.005, float(np.median(rel))
    # and 90% of frames within 1%
    assert np.quantile(rel, 0.9) < 0.01, float(np.quantile(rel, 0.9))


def test_process_pitch_features(rng):
    """ProcessPitch layout: (T,3) [pov, normalized-log-pitch,
    delta-pitch]; normalized log-pitch is ~zero-mean over a steady
    tone and the delta reflects log-pitch slope."""
    from kaldi_tpu.features.pitch import process_pitch
    sf = 16000.0
    t = np.arange(int(sf * 0.8)) / sf
    wave = np.sign(np.sin(2 * np.pi * 200.0 * t))
    raw = compute_kaldi_pitch(wave, PitchExtractionOptions(samp_freq=sf))
    feats = process_pitch(raw)
    assert feats.shape == (raw.shape[0], 3)
    # steady tone: normalized log pitch ~ 0, delta ~ 0
    assert np.abs(feats[5:-5, 1]).max() < 0.1
    assert np.abs(feats[5:-5, 2]).max() < 0.5
    # rising pitch: positive delta on voiced frames
    f0 = 150.0 * np.exp(t * 0.5)   # +0.5 log/s
    phase = 2 * np.pi * np.cumsum(f0) / sf
    wave2 = np.sign(np.sin(phase))
    raw2 = compute_kaldi_pitch(wave2, PitchExtractionOptions(samp_freq=sf))
    feats2 = process_pitch(raw2)
    # delta-pitch ≈ 10 * 0.005 log/frame = 0.05 on average
    assert feats2[5:-5, 2].mean() > 0.02
    assert feats2.dtype == np.float32
