"""The yesno-equivalent end-to-end recipe, runnable as a module:

    python -m kaldi_tpu.pipelines.yesno [--num-utts=30] [--num-iters=12]

Parity target: egs/yesno/s5/run.sh — the reference's minimal smoke
recipe (data prep → MFCC+CMVN → mono GMM train → HCLG → decode →
score), expected %WER 0.00.  Corpus is synthetic (see pipelines/data.py
— this environment ships no audio).
"""

from __future__ import annotations

import sys

import numpy as np

from kaldi_tpu.core.logging import Timer, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    add_deltas,
    apply_cmvn,
    compute_cmvn_stats,
)
from kaldi_tpu.fst import ArpaModel, Lang, arpa_to_fst, make_unigram_arpa, mkgraph
from kaldi_tpu.decoder.beam import BeamDecoderConfig
from kaldi_tpu.pipelines.data import make_synthetic_dataset, yesno_lexicon
from kaldi_tpu.pipelines.decode import decode_gmm
from kaldi_tpu.pipelines.mono import MonoTrainConfig, train_mono

log = get_logger(__name__)


def make_feats(data, samp_freq=8000.0, num_mel=15, num_ceps=10):
    """MFCC + per-speaker CMVN + deltas (steps/make_mfcc.sh +
    compute_cmvn_stats.sh + add-deltas feature pipe)."""
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=samp_freq, dither=0.0),
        mel_opts=MelBanksOptions(num_bins=num_mel), num_ceps=num_ceps))
    raw = {u: mfcc.compute(data.wavs[u][0] * 32768.0) for u in data.utts}
    spk_stats = {spk: sum(compute_cmvn_stats(raw[u]) for u in utts)
                 for spk, utts in data.spk2utt().items()}
    return {u: np.asarray(add_deltas(
        np.asarray(apply_cmvn(raw[u], spk_stats[data.utt2spk[u]])),
        DeltaFeaturesOptions())) for u in data.utts}


def run(num_utts: int = 30, num_test: int = 10, num_iters: int = 12,
        totgauss: int = 120, beam: float = 16.0, acoustic_scale: float = 0.1):
    timer = Timer()
    lex = yesno_lexicon()
    train = make_synthetic_dataset(lex, num_utts=num_utts, max_words=4, seed=1)
    test = make_synthetic_dataset(lex, num_utts=num_test, max_words=4, seed=2)
    lang = Lang(lex)
    log.info("stage 0: data prepared (%d train / %d test utts)",
             num_utts, num_test)

    train_feats = make_feats(train)
    test_feats = make_feats(test)
    log.info("stage 1: features done (%.1fs)", timer.elapsed())

    cfg = MonoTrainConfig(num_iters=num_iters, totgauss=totgauss,
                          realign_iters=tuple(range(1, num_iters, 2)))
    model = train_mono(train_feats, train.text, lang, cfg)
    log.info("stage 2: mono training done (%.1fs)", timer.elapsed())

    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, model.tm, arpa_to_fst(arpa, lang.words))
    log.info("stage 3: HCLG built: %s", HCLG)

    result = decode_gmm(test_feats, model.am, model.tm, HCLG, lang,
                        BeamDecoderConfig(beam=beam, max_active=200,
                                          acoustic_scale=acoustic_scale),
                        refs=test.text)
    log.info("stage 4: decode done (%.1fs total)", timer.elapsed())
    print(result.wer)
    return result


def main(argv=None):
    po = ParseOptions("Usage: python -m kaldi_tpu.pipelines.yesno [options]")
    po.register("num-utts", int, 30, "Number of training utterances")
    po.register("num-iters", int, 12, "Training iterations")
    po.register("totgauss", int, 120, "Target total Gaussians")
    po.register("beam", float, 16.0, "Decoding beam")
    po.register("acoustic-scale", float, 0.1, "Acoustic scale")
    po.read(argv)
    result = run(num_utts=po["num-utts"], num_iters=po["num-iters"],
                 totgauss=po["totgauss"], beam=po["beam"],
                 acoustic_scale=po["acoustic-scale"])
    return 0 if result.wer.wer == 0.0 else 1


if __name__ == "__main__":
    sys.exit(main())
