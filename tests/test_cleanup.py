"""Biased-LM cleanup segmentation (pipelines/cleanup.py): ctm-edits
alignment, segment selection, junk exclusion, bad-utterance
detection.  Parity: steps/cleanup/segment_long_utterances.sh +
clean_and_segment_data.sh."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.fst import Lang, Lexicon
from kaldi_tpu.pipelines.cleanup import (CleanupOptions, CtmEdit,
                                         clean_and_segment, ctm_edits,
                                         make_biased_lm,
                                         select_segments)


def test_ctm_edits_ops():
    hyp = [("a", 0, 3), ("x", 3, 2), ("c", 5, 3), ("d", 8, 2)]
    ref = ["a", "b", "c", "e", "d"]
    edits = ctm_edits(hyp, ref)
    ops = [(e.op, e.word or e.ref_word) for e in edits]
    assert ("cor", "a") in ops and ("cor", "c") in ops \
        and ("cor", "d") in ops
    assert ("sub", "x") in ops
    assert ("del", "e") in ops
    # times ride the hypothesis side
    assert edits[0].begin == 0 and edits[0].dur == 3


def test_select_segments_splits_on_errors():
    edits = [CtmEdit("a", "a", 0, 5, "cor"),
             CtmEdit("b", "b", 5, 5, "cor"),
             CtmEdit("x", "", 10, 5, "ins"),
             CtmEdit("c", "c", 15, 5, "cor")]
    segs, frac = select_segments(edits, 20, CleanupOptions(
        pad_frames=0))
    assert len(segs) == 2
    assert segs[0].words == ["a", "b"] and (segs[0].begin,
                                            segs[0].end) == (0, 10)
    assert segs[1].words == ["c"] and (segs[1].begin,
                                       segs[1].end) == (15, 20)
    assert frac == 1.0     # all REF words were found correct


def test_biased_lm_prefers_transcript():
    arpa = make_biased_lm(["go", "stop", "go"], ["go", "stop", "left"],
                          order=2)
    uni = dict(arpa.ngrams[0])
    # transcript words carry far more mass than the loop-only word
    assert uni[("go",)][0] > uni[("left",)][0]


@pytest.fixture
def setup(tmp_path):
    rng = np.random.default_rng(7)
    lex = Lexicon(entries=[("GO", ["g"]), ("STOP", ["s"]),
                           ("LEFT", ["l"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    J, D = tree.num_pdfs, 4
    protos = 4.0 * rng.standard_normal((J, D))

    def synth(word_seq, frames_per_state=3):
        pdfs = []
        for w in word_seq:
            ph = {"GO": "g", "STOP": "s", "LEFT": "l"}[w]
            pid = lang.phones[ph]
            for st in range(3):
                pdfs += [tree.compute([pid], st)] * frames_per_state
        x = protos[pdfs] + 0.2 * rng.standard_normal(
            (len(pdfs), D))
        return x.astype(np.float32)

    am = AmDiagGmm(np.ones((J, 1)), protos[:, None, :],
                   np.full((J, 1, D), 0.25))
    return lang, tm, am, synth


def test_clean_and_segment_excludes_junk(setup):
    """Audio = GO STOP [LEFT junk] GO; claimed transcript omits LEFT:
    the biased decode + ctm-edits must keep GO STOP ... GO segments
    and exclude the junk span."""
    lang, tm, am, synth = setup
    feats = {"u1": synth(["GO", "STOP", "LEFT", "GO"])}
    text = {"u1": ["GO", "STOP", "GO"]}
    segs, bad, stats = clean_and_segment(
        feats, text, lang, tm, am,
        CleanupOptions(pad_frames=0, loop_prob=0.3))
    assert bad == []
    s = segs["u1"]
    words = [w for seg in s for w in seg.words]
    assert words == ["GO", "STOP", "GO"]
    # the junk span (frames 18-27: third word) is in no segment
    for seg in s:
        assert not (seg.begin < 22 and seg.end > 23)
    assert stats["kept_frames"] < stats["frames"]


def test_clean_and_segment_flags_bad_utts(setup):
    """A transcript unrelated to the audio → BAD."""
    lang, tm, am, synth = setup
    feats = {"u1": synth(["LEFT", "LEFT", "LEFT", "LEFT"])}
    text = {"u1": ["GO", "STOP", "GO", "STOP"]}
    segs, bad, stats = clean_and_segment(
        feats, text, lang, tm, am,
        CleanupOptions(min_correct_frac=0.5, loop_prob=0.3))
    assert bad == ["u1"]
    assert "u1" not in segs
