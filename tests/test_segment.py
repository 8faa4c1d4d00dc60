"""Long-audio segmentation tests (segment_long_utterances role)."""

import numpy as np
import pytest

from kaldi_tpu.pipelines.segment import (SegmentationOptions, segment_frames,
                                         segment_long_audio, write_segments)


def test_segment_frames_merge_drop_split():
    opts = SegmentationOptions(frame_shift=0.01, min_silence_length=0.1,
                               min_segment_length=0.15,
                               max_segment_length=1.0,
                               segment_padding=0.0)
    vad = np.zeros(400)
    vad[10:50] = 1          # segment A (0.4 s)
    vad[55:90] = 1          # gap 0.05 s < 0.1 → merges with A
    vad[150:160] = 1        # 0.1 s < min_segment_length 0.15 → dropped
    vad[200:390] = 1        # 1.9 s > max 1.0 → split
    segs = segment_frames(vad, opts)
    assert (10, 90) in segs
    assert not any(s <= 150 < e for s, e in segs)
    longs = [(s, e) for s, e in segs if s >= 200]
    assert len(longs) >= 2
    assert all(e - s <= 100 for s, e in longs)
    # coverage of the long speech region preserved
    assert longs[0][0] == 200 and longs[-1][1] == 390


def test_segment_long_audio_finds_bursts(rng):
    rate = 8000
    wave = 0.001 * rng.standard_normal(rate * 4)
    truth = [(0.5, 1.2), (2.0, 2.6), (3.1, 3.8)]
    for tb, te in truth:
        t = np.arange(int((te - tb) * rate)) / rate
        wave[int(tb * rate):int(tb * rate) + len(t)] += \
            0.5 * np.sin(2 * np.pi * 300 * t)
    segs = segment_long_audio(wave.astype(np.float32), rate)
    assert len(segs) == 3, segs
    for (gb, ge), (tb, te) in zip(segs, truth):
        assert abs(gb - tb) < 0.1 and abs(ge - te) < 0.1, (segs, truth)


def test_write_segments_roundtrip(tmp_path):
    from kaldi_tpu.cli import main
    from kaldi_tpu.core.table import SequentialTableReader, TableWriter
    rate = 8000
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(rate * 2) * 500).astype(np.int16)
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["reco1"] = (wave, rate)
    write_segments(str(tmp_path / "segments"),
                   {"reco1": [(0.2, 0.7), (1.0, 1.4)]})
    assert main(["extract-segments", f"ark:{tmp_path}/wav.ark",
                 str(tmp_path / "segments"),
                 f"ark:{tmp_path}/segs.ark"]) == 0
    segs = dict(SequentialTableReader(f"ark:{tmp_path}/segs.ark",
                                      holder="wav"))
    assert sorted(segs) == ["reco1-0000", "reco1-0001"]
    assert len(segs["reco1-0000"][0]) == int(0.5 * rate)
