"""Data cleanup: biased-LM decoding + ctm-edits segmentation of long
(possibly errorful) utterances.

Parity target: steps/cleanup/segment_long_utterances.sh and the
ctm-edits machinery behind it (steps/cleanup/internal/*,
src/latbin usage in steps/cleanup/clean_and_segment_data.sh) — the
round-2 verdict's missing #5: the basic VAD split existed
(pipelines/segment.py) but the biased-LM decode + bad-utterance
detection did not.

The flow, per long utterance with transcript `text`:
  1. make_biased_lm: a per-utterance n-gram LM over the transcript,
     interpolated with a uniform word loop so the decoder may insert/
     delete relative to the claimed transcript
     (steps/cleanup/make_biased_lm_graphs.sh).
  2. decode against the biased HCLG → best-path CTM (word times).
  3. ctm_edits: Levenshtein-align the decoded word sequence to the
     transcript, attaching times — entries tagged cor/sub/ins/del
     (get_ctm_edits.py role).
  4. select_segments: keep maximal runs of correct words (length and
     silence-padding constrained), emitting (start, end, cleaned
     words) sub-segments; an utterance whose correct fraction is
     below `min_correct_frac` is flagged BAD and dropped
     (the bad-utterance detection of clean_and_segment_data.sh).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.pipelines.score import edit_distance

log = get_logger(__name__)


@dataclasses.dataclass
class CleanupOptions:
    lm_order: int = 2
    # interpolation mass given to the uniform word loop (the escape
    # path that lets the decode diverge from the claimed transcript)
    loop_prob: float = 0.1
    min_segment_words: int = 1
    min_correct_frac: float = 0.3      # below → utterance is BAD
    pad_frames: int = 3                # context frames kept per side
    acoustic_scale: float = 1.0


@dataclasses.dataclass
class CtmEdit:
    word: str            # hypothesis word ("" for deletions)
    ref_word: str        # reference word ("" for insertions)
    begin: int           # frame
    dur: int             # frames
    op: str              # cor | sub | ins | del


def make_biased_lm(text: Sequence[str], vocab: Sequence[str],
                   order: int = 2, loop_prob: float = 0.1):
    """Per-utterance biased LM (ArpaModel): an n-gram estimate over
    the transcript, mixed at the count level with a uniform loop over
    ``vocab`` so insertions/substitutions stay decodable
    (make_biased_lm_graphs.sh role)."""
    from kaldi_tpu.fst.arpa import ArpaModel, estimate_arpa, \
        make_unigram_arpa
    if not text:
        return ArpaModel.parse(
            make_unigram_arpa({w: 1.0 for w in vocab}))
    # repeat the transcript to dominate, plus a thin pass over the
    # full vocabulary as the escape loop
    corpus = [list(text)] * max(1, int(round((1 - loop_prob) * 10)))
    corpus += [[w] for w in vocab
               for _ in range(max(1, int(round(loop_prob * 10 /
                                               max(len(vocab), 1)))))]
    return estimate_arpa(corpus, order=order, prune_count=0,
                         vocab=list(vocab))


def ctm_edits(hyp_ctm: Sequence[Tuple[str, int, int]],
              ref_words: Sequence[str]) -> List[CtmEdit]:
    """Align the decoded (word, begin-frame, dur-frames) sequence to
    the reference transcript (get_ctm_edits role).  Standard
    Levenshtein back-trace with times carried from the hypothesis
    side; deletions get zero-length entries at the preceding
    hypothesis boundary."""
    hyp_words = [w for w, _b, _d in hyp_ctm]
    n, m = len(hyp_words), len(ref_words)
    D = np.zeros((n + 1, m + 1), np.int64)
    D[:, 0] = np.arange(n + 1)
    D[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = min(
                D[i - 1, j - 1] + (hyp_words[i - 1] != ref_words[j - 1]),
                D[i - 1, j] + 1, D[i, j - 1] + 1)
    out: List[CtmEdit] = []
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and D[i, j] == D[i - 1, j - 1] + (
                hyp_words[i - 1] != ref_words[j - 1]):
            w, b, d = hyp_ctm[i - 1]
            op = "cor" if hyp_words[i - 1] == ref_words[j - 1] else "sub"
            out.append(CtmEdit(w, ref_words[j - 1], b, d, op))
            i -= 1
            j -= 1
        elif i > 0 and D[i, j] == D[i - 1, j] + 1:
            w, b, d = hyp_ctm[i - 1]
            out.append(CtmEdit(w, "", b, d, "ins"))
            i -= 1
        else:
            b = hyp_ctm[i - 1][1] + hyp_ctm[i - 1][2] if i > 0 else 0
            out.append(CtmEdit("", ref_words[j - 1], b, 0, "del"))
            j -= 1
    out.reverse()
    return out


@dataclasses.dataclass
class Segment:
    begin: int           # frame
    end: int             # frame (exclusive)
    words: List[str]


def select_segments(edits: Sequence[CtmEdit], num_frames: int,
                    opts: CleanupOptions) -> Tuple[List[Segment], float]:
    """Maximal runs of correct words → segments (segment_ctm_edits
    role); returns (segments, correct fraction over ref words)."""
    n_ref = sum(1 for e in edits if e.op in ("cor", "sub", "del"))
    n_cor = sum(1 for e in edits if e.op == "cor")
    frac = n_cor / max(n_ref, 1)
    segs: List[Segment] = []
    cur: List[CtmEdit] = []

    def flush():
        if len(cur) >= opts.min_segment_words:
            b = max(0, cur[0].begin - opts.pad_frames)
            e = min(num_frames, cur[-1].begin + cur[-1].dur
                    + opts.pad_frames)
            segs.append(Segment(b, e, [c.word for c in cur]))
        cur.clear()

    for e in edits:
        if e.op == "cor":
            cur.append(e)
        else:
            flush()
    flush()
    return segs, frac


def clean_and_segment(feats: Dict[str, np.ndarray],
                      text: Dict[str, List[str]],
                      lang, tm, am,
                      opts: CleanupOptions = None):
    """Per-utterance biased decode + ctm-edits segmentation.  Returns
    (segments: utt → [Segment], bad_utts: list, stats dict).
    ``am`` provides loglikes(feats); ``lang``/``tm`` build the biased
    graphs (segment_long_utterances.sh end-to-end)."""
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst import arpa_to_fst, mkgraph
    from kaldi_tpu.lattice.ctm import align_words_to_phones, lang_prons
    opts = opts or CleanupOptions()
    # the escape loop must cover the FULL lexicon, not just the
    # claimed transcripts — otherwise junk audio is forced onto
    # transcript words and comes back as false "correct" matches
    vocab = sorted({e[0] for e in lang.lexicon.entries})
    prons = lang_prons(lang)
    out_segs: Dict[str, List[Segment]] = {}
    bad: List[str] = []
    tot_frames = kept_frames = 0
    for utt in sorted(feats):
        ref = text.get(utt, [])
        arpa = make_biased_lm(ref, vocab, order=opts.lm_order,
                              loop_prob=opts.loop_prob)
        G = arpa_to_fst(arpa, lang.words)
        HCLG = mkgraph(lang, tm, G)
        dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                           DenseDecoderConfig(
                               beam=16.0,
                               acoustic_scale=opts.acoustic_scale))
        ll = np.asarray(am.loglikes(feats[utt]), np.float32)
        tids, ols, _cost = dec.decode(ll)
        sil = {lang.phones[p] for p in ("SIL",) if p in lang.phones}
        spans = align_words_to_phones(ols, tids, tm, prons, sil)
        hyp_ctm = [(lang.words.find(w), b, d) for w, b, d in spans]
        edits = ctm_edits(hyp_ctm, ref)
        segs, frac = select_segments(edits, len(ll), opts)
        tot_frames += len(ll)
        if frac < opts.min_correct_frac:
            bad.append(utt)
            log.info("cleanup: %s BAD (correct frac %.2f)", utt, frac)
            continue
        out_segs[utt] = segs
        kept_frames += sum(s.end - s.begin for s in segs)
    stats = {"utts": len(feats), "bad": len(bad),
             "frames": tot_frames, "kept_frames": kept_frames}
    log.info("cleanup: %d/%d utts kept, %d/%d frames in segments",
             len(out_segs), len(feats), kept_frames, tot_frames)
    return out_segs, bad, stats
