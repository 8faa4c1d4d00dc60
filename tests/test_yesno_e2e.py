"""End-to-end integration test: the yesno-equivalent smoke run.

Mirrors egs/yesno/s5/run.sh (the reference's canonical CI test,
SURVEY.md §4): synthetic wavs → MFCC+CMVN+deltas → flat-start mono
GMM-HMM training with realignment → HCLG build → batched beam decode →
expect %WER 0.00.
"""

import numpy as np
import pytest

from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    FrameExtractionOptions,
    Mfcc,
    MfccOptions,
    MelBanksOptions,
    add_deltas,
    apply_cmvn,
    compute_cmvn_stats,
)
from kaldi_tpu.fst import ArpaModel, Lang, arpa_to_fst, make_unigram_arpa, mkgraph
from kaldi_tpu.decoder.beam import BeamDecoderConfig
from kaldi_tpu.pipelines import (
    MonoTrainConfig,
    decode_gmm,
    make_synthetic_dataset,
    train_mono,
    yesno_lexicon,
)


def _make_feats(data, samp_freq=8000.0):
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=samp_freq, dither=0.0),
        mel_opts=MelBanksOptions(num_bins=15),
        num_ceps=10))
    feats = {}
    for u in data.utts:
        wave, rate = data.wavs[u]
        feats[u] = mfcc.compute(wave * 32768.0)  # kaldi int16 scaling
    # per-speaker CMVN (steps/compute_cmvn_stats.sh)
    spk_stats = {}
    for spk, utts in data.spk2utt().items():
        stats = sum(compute_cmvn_stats(feats[u]) for u in utts)
        spk_stats[spk] = stats
    out = {}
    for u in data.utts:
        f = apply_cmvn(feats[u], spk_stats[data.utt2spk[u]])
        out[u] = np.asarray(add_deltas(np.asarray(f), DeltaFeaturesOptions()))
    return out


@pytest.mark.slow
def test_yesno_end_to_end():
    lex = yesno_lexicon()
    train = make_synthetic_dataset(lex, num_utts=30, max_words=4, seed=1)
    test = make_synthetic_dataset(lex, num_utts=10, max_words=4, seed=2)

    lang = Lang(lex)
    train_feats = _make_feats(train)
    test_feats = _make_feats(test)

    cfg = MonoTrainConfig(num_iters=12, totgauss=120,
                          realign_iters=(1, 2, 3, 4, 5, 6, 8, 10))
    model = train_mono(train_feats, train.text, lang, cfg)

    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    G = arpa_to_fst(arpa, lang.words)
    HCLG = mkgraph(lang, model.tm, G)

    result = decode_gmm(test_feats, model.am, model.tm, HCLG, lang,
                        BeamDecoderConfig(beam=16.0, max_active=200,
                                          acoustic_scale=0.1),
                        refs=test.text)
    assert result.wer is not None
    # The canonical yesno result: perfect recognition.
    assert result.wer.wer == 0.0, str(result.wer)

    # Training-set decode must also be perfect.
    result_tr = decode_gmm(train_feats, model.am, model.tm, HCLG, lang,
                           BeamDecoderConfig(beam=16.0, max_active=200,
                                             acoustic_scale=0.1),
                           refs=train.text)
    assert result_tr.wer.wer == 0.0, str(result_tr.wer)
