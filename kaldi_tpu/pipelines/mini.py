"""Multi-stage GMM recipe: mono → tri1 (deltas) → tri2b (LDA+MLLT) →
tri3b (SAT/fMLLR), runnable as a module:

    python -m kaldi_tpu.pipelines.mini

Parity target: egs/mini_librispeech/s5/run.sh stage flow (SURVEY.md §0
BASELINE configs: 'mini_librispeech tri3b (LDA+MLLT+SAT) decode'), on a
synthetic corpus with a larger lexicon than yesno.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.core.logging import Timer, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.decoder.beam import BeamDecoderConfig
from kaldi_tpu.features import (
    DeltaFeaturesOptions,
    FrameExtractionOptions,
    MelBanksOptions,
    Mfcc,
    MfccOptions,
    add_deltas,
    apply_cmvn,
    compute_cmvn_stats,
    splice_frames,
)
from kaldi_tpu.am.transforms import apply_transform
from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
    make_unigram_arpa, mkgraph
from kaldi_tpu.pipelines.data import make_synthetic_dataset
from kaldi_tpu.pipelines.decode import decode_gmm
from kaldi_tpu.pipelines.mono import MonoTrainConfig, train_mono
from kaldi_tpu.pipelines.score import compute_wer
from kaldi_tpu.pipelines.tri import (
    TriTrainConfig,
    apply_mllt_to_model,
    estimate_fmllr_per_speaker,
    estimate_fmllr_per_speaker_post,
    estimate_lda,
    estimate_mllt,
    train_tri,
)

log = get_logger(__name__)


def mini_lexicon() -> Lexicon:
    return Lexicon(entries=[
        ("ONE", ["W", "AH", "N"]),
        ("TWO", ["T", "UW"]),
        ("THREE", ["TH", "R", "IY"]),
        ("FOUR", ["F", "AO", "R"]),
        ("FIVE", ["F", "AY", "V"]),
        ("SIX", ["S", "IH", "K"]),
        ("SEVEN", ["S", "EH", "V", "AH", "N"]),
        ("EIGHT", ["EY", "T"]),
    ])


def base_feats(data, samp_freq=8000.0):
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=samp_freq, dither=0.0),
        mel_opts=MelBanksOptions(num_bins=15), num_ceps=10))
    raw = {u: mfcc.compute(data.wavs[u][0] * 32768.0) for u in data.utts}
    spk_stats = {spk: sum(compute_cmvn_stats(raw[u]) for u in utts)
                 for spk, utts in data.spk2utt().items()}
    return {u: np.asarray(apply_cmvn(raw[u], spk_stats[data.utt2spk[u]]))
            for u in data.utts}


def run(num_utts: int = 60, num_test: int = 15, seed: int = 1,
        quick: bool = False, lexicon: Optional[Lexicon] = None,
        noise: float = 0.0, speaker_warp: float = 0.0,
        heldout_speakers: bool = False, formants=None,
        return_systems: bool = False,
        tri_leaves: Optional[int] = None,
        tri_gauss: Optional[int] = None,
        lda_dim: Optional[int] = None,
        coarticulation: float = 0.0,
        num_speakers: int = 4,
        num_test_speakers: int = 3,
        lm_order: int = 1):
    """The tri ladder.  noise/speaker_warp/heldout_speakers/formants
    make the corpus hard enough for NONZERO WER (pipelines/ladder.py);
    defaults reproduce the easy smoke corpus.  ``lm_order`` > 1
    estimates G from the TRAINING transcripts (the local/..._train_lms
    role) instead of the unigram grammar — at ≥100-word lexicons this
    gives the decoder real LM disambiguation work."""
    timer = Timer()
    lex = lexicon or mini_lexicon()
    lang = Lang(lex)
    train = make_synthetic_dataset(lex, num_utts=num_utts, max_words=5,
                                   num_speakers=num_speakers, seed=seed,
                                   noise=noise, speaker_warp=speaker_warp,
                                   formants=formants,
                                   coarticulation=coarticulation)
    test = make_synthetic_dataset(
        lex, num_utts=num_test, max_words=5,
        num_speakers=num_test_speakers,
        seed=seed + 100, noise=noise, speaker_warp=speaker_warp,
        formants=formants, coarticulation=coarticulation,
        speaker_prefix="tspk" if heldout_speakers else "spk")
    base_tr = base_feats(train)
    base_te = base_feats(test)
    delta_tr = {u: np.asarray(add_deltas(f)) for u, f in base_tr.items()}
    delta_te = {u: np.asarray(add_deltas(f)) for u, f in base_te.items()}
    if lm_order > 1:
        from kaldi_tpu.fst.arpa import estimate_arpa
        arpa = estimate_arpa([train.text[u] for u in train.utts],
                             order=lm_order, prune_count=1,
                             vocab=[w for w, _ in lex.entries])
        G = arpa_to_fst(arpa, lang.words)
    else:
        G = arpa_to_fst(ArpaModel.parse(make_unigram_arpa(
            {w: 1.0 for w, _ in lex.entries})), lang.words)
    dcfg = BeamDecoderConfig(beam=16.0, max_active=2000, acoustic_scale=0.1)
    wers = {}

    n_mono = 8 if quick else 14
    mono = train_mono(delta_tr, train.text, lang, MonoTrainConfig(
        num_iters=n_mono, totgauss=150 if quick else 300,
        realign_iters=tuple(range(1, n_mono, 2))))
    HCLG = mkgraph(lang, mono.tm, G)
    res = decode_gmm(delta_te, mono.am, mono.tm, HCLG, lang, dcfg,
                     refs=test.text)
    wers["mono"] = res.wer
    log.info("mono decode: %s (%.0fs)", res.wer, timer.elapsed())

    # alignments from mono for the tree
    from kaldi_tpu.decoder.align import DenseAligner, in_degrees, \
        pack_dense_reverse
    from kaldi_tpu.decoder.training_graph import TrainingGraphCompiler
    compiler = TrainingGraphCompiler(lang, mono.tm)
    graphs = {u: compiler.compile_text(train.text[u]) for u in delta_tr}
    ae = max(in_degrees(g)[0] for g in graphs.values())
    an = max(max(in_degrees(g)[1] for g in graphs.values()), 1)
    smax = max(g.num_states for g in graphs.values())
    dense = [pack_dense_reverse(graphs[u], smax, ae, an)
             for u in sorted(delta_tr)]
    aligner = DenseAligner(mono.tm.tid_to_pdf_array)
    lls = [np.asarray(mono.am.loglikes(delta_tr[u]))
           for u in sorted(delta_tr)]
    mono_ali = {u: tids for u, (tids, _) in
                zip(sorted(delta_tr), aligner.align_batch(dense, lls))}

    # --- tri1: triphone tree on delta features.  Tree size must scale
    # with the corpus: on the hard heldout-speaker ladder a 100-leaf
    # tree over-splits (~120 utts of data) and tri1 regresses below
    # mono; a swept 30-leaf/600-gauss config beats mono decisively
    # (ladder passes tri_leaves=30), mirroring how Kaldi recipes tune
    # <num-leaves> <tot-gauss> per corpus in run.sh.  tcfg flows into
    # tri2b/tri3b below, so the whole tri ladder uses the scaled tree.
    tcfg = TriTrainConfig(
        num_iters=8 if quick else 15,
        totgauss=tri_gauss or (300 if quick else 600),
        num_leaves=tri_leaves or (60 if quick else 100),
        realign_iters=(1, 2, 4, 6) if quick else (1, 2, 4, 6, 8, 10, 12))
    if lda_dim is not None:
        tcfg.lda_dim = lda_dim
    tri1, tri1_ali = train_tri(delta_tr, train.text, lang, mono, mono_ali,
                               tcfg)
    HCLG1 = mkgraph(lang, tri1.tm, G)
    res = decode_gmm(delta_te, tri1.am, tri1.tm, HCLG1, lang, dcfg,
                     refs=test.text)
    wers["tri1"] = res.wer
    log.info("tri1 decode: %s (%.0fs)", res.wer, timer.elapsed())

    # --- tri2b: LDA+MLLT on spliced base features
    sl, sr = 3, 3
    spl_tr = {u: np.asarray(splice_frames(f, sl, sr))
              for u, f in base_tr.items()}
    spl_te = {u: np.asarray(splice_frames(f, sl, sr))
              for u, f in base_te.items()}
    lda = estimate_lda(spl_tr, tri1_ali, tri1.tm, tcfg.lda_dim)
    lda_tr = {u: apply_transform(f, lda).astype(np.float32)
              for u, f in spl_tr.items()}
    lda_te = {u: apply_transform(f, lda).astype(np.float32)
              for u, f in spl_te.items()}
    tri2b, tri2b_ali = train_tri(lda_tr, train.text, lang, tri1, tri1_ali,
                                 tcfg)
    # MLLT estimation + model transform, then RETRAIN on the rotated
    # features (a coarse-grained version of steps/train_lda_mllt.sh's
    # interleaved MLLT rounds — one post-hoc round without retraining
    # left the model mismatched to the transformed feature space)
    M, impr = estimate_mllt(tri2b.am, lda_tr, tri2b_ali, tri2b.tm)
    mllt_lda = np.concatenate([M @ lda[:, :-1], (M @ lda[:, -1:])], axis=1)
    lda_tr = {u: apply_transform(f, mllt_lda).astype(np.float32)
              for u, f in spl_tr.items()}
    lda_te = {u: apply_transform(f, mllt_lda).astype(np.float32)
              for u, f in spl_te.items()}
    apply_mllt_to_model(tri2b.am, M)
    tri2b, tri2b_ali = train_tri(lda_tr, train.text, lang, tri2b,
                                 tri2b_ali, tcfg)
    tri2b.lda_mat = mllt_lda
    HCLG2 = mkgraph(lang, tri2b.tm, G)
    res = decode_gmm(lda_te, tri2b.am, tri2b.tm, HCLG2, lang, dcfg,
                     refs=test.text)
    wers["tri2b"] = res.wer
    log.info("tri2b decode: %s (%.0fs)", res.wer, timer.elapsed())

    # --- tri3b: SAT — per-speaker fMLLR on top of LDA+MLLT features
    fmllr = estimate_fmllr_per_speaker(
        tri2b.am, lda_tr, tri2b_ali, tri2b.tm,
        {u: train.utt2spk[u] for u in lda_tr}, min_count=50.0)
    sat_tr = {u: apply_transform(f, fmllr.get(train.utt2spk[u],
                                              np.eye(f.shape[1], f.shape[1] + 1)))
              .astype(np.float32) for u, f in lda_tr.items()}
    tri3b, tri3b_ali = train_tri(sat_tr, train.text, lang, tri2b, tri2b_ali,
                                 tcfg)
    # two-pass SAT decode (steps/decode_fmllr.sh): 1st pass with the
    # ALIGNMENT MODEL (gmm-acc-stats-twofeats alimdl — the SAT model is
    # mismatched to unadapted features) → LATTICE posteriors with
    # silence down-weighted (lattice-to-post | weight-silence-post |
    # gmm-est-fmllr) → adapted decode with the SAT model → second
    # fMLLR round from that decode's lattice → final decode.
    from kaldi_tpu.lattice.functions import frame_posteriors
    from kaldi_tpu.pipelines.decode import decode_gmm_lattice
    from kaldi_tpu.pipelines.tri import estimate_alignment_model
    HCLG3 = mkgraph(lang, tri3b.tm, G)
    alimdl = estimate_alignment_model(tri3b.am, tri3b.tm, sat_tr,
                                      lda_tr, tri3b_ali)
    te_spk = {u: test.utt2spk[u] for u in lda_te}

    def fmllr_round(am_pass, feats_pass, prev=None):
        """decode → lattice posteriors → per-speaker fMLLR (composed
        with `prev` when this is the second round)."""
        first = decode_gmm_lattice(feats_pass, am_pass, tri3b.tm,
                                   HCLG3, lang, beam=dcfg.beam,
                                   acoustic_scale=dcfg.acoustic_scale)
        # lattice acoustic costs are stored pre-scaled → scale 1.0
        posts = {u: frame_posteriors(first.lattices[u],
                                     acoustic_scale=1.0)
                 for u in feats_pass}
        return estimate_fmllr_per_speaker_post(
            tri3b.am, feats_pass, posts, tri3b.tm, te_spk,
            silence_phones=lang.silence_phones, silence_weight=0.01,
            min_count=50.0)

    def adapt(feats, trans):
        return {u: apply_transform(
            f, trans.get(te_spk[u], np.eye(f.shape[1], f.shape[1] + 1))
        ).astype(np.float32) for u, f in feats.items()}

    fmllr_te = fmllr_round(alimdl, lda_te)
    sat_te = adapt(lda_te, fmllr_te)
    # second round: re-estimate from the ADAPTED decode's lattice — a
    # correction transform on top of the first (decode_fmllr.sh's
    # est_fmllr2/compose-transforms stage)
    fmllr2 = fmllr_round(tri3b.am, sat_te)
    sat_te = adapt(sat_te, fmllr2)
    res = decode_gmm(sat_te, tri3b.am, tri3b.tm, HCLG3, lang, dcfg,
                     refs=test.text)
    wers["tri3b"] = res.wer
    log.info("tri3b decode: %s (%.0fs total)", res.wer, timer.elapsed())

    for stage, wer in wers.items():
        print(f"{stage}: {wer}")
    if return_systems:
        return wers, {
            "lang": lang, "train": train, "test": test, "G": G,
            "delta_tr": delta_tr, "delta_te": delta_te,
            "mono": mono, "mono_ali": mono_ali,
            "tri3b": tri3b, "tri3b_ali": tri3b_ali,
            # SAT-adapted features both sides: the chain stage trains on
            # these (the reference trains chain on the best adapted
            # front-end; sat_te uses the tri3b first-pass fMLLR, i.e.
            # steps/decode_fmllr.sh then nnet decode on those feats)
            "sat_tr": sat_tr, "sat_te": sat_te, "dcfg": dcfg,
        }
    return wers


def main(argv=None):
    po = ParseOptions("Usage: python -m kaldi_tpu.pipelines.mini [options]")
    po.register("num-utts", int, 60, "training utterances")
    po.register("quick", bool, False, "reduced iterations")
    po.read(argv)
    wers = run(num_utts=po["num-utts"], quick=po["quick"])
    return 0 if wers["tri3b"].wer <= wers["mono"].wer else 1


if __name__ == "__main__":
    sys.exit(main())
