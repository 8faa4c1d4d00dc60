"""File-based recipe (pipelines/wav_recipe.py) — the real-audio data
path: RIFF wavs + data dir on disk, features/CMVN/decode via CLI tools
and ark/scp/.mdl/binary-FST artifacts only."""

import os

import numpy as np

from kaldi_tpu.pipelines import wav_recipe
from kaldi_tpu.pipelines.datadir import read_data_dir


def test_wav_recipe_end_to_end(tmp_path):
    work = str(tmp_path / "wavwork")
    wer = wav_recipe.run(work, num_utts=12, num_test=6, num_iters=5,
                         totgauss=60)
    # disk artifacts exist where the stage contract puts them
    assert os.path.exists(os.path.join(work, "data/train/wav.scp"))
    assert os.path.exists(os.path.join(work, "exp/mono/final.mdl"))
    assert os.path.exists(os.path.join(work, "exp/mono/graph/HCLG.fst"))
    assert os.path.exists(
        os.path.join(work, "exp/mono/decode_test/lat.1.ark"))
    d = read_data_dir(os.path.join(work, "data/train"))
    assert d.feats_scp and d.cmvn_scp
    # wav files are real RIFF
    some_wav = next(iter(d.wav_scp.values()))
    with open(some_wav, "rb") as f:
        assert f.read(4) == b"RIFF"
    # the easy-corpus contract (egs/yesno): perfect recognition
    assert wer.wer == 0.0


def test_wav_recipe_feats_match_direct(tmp_path):
    """CLI-computed features from the .wav FILES == direct in-memory
    MFCC of the same waveforms (the offline/online-style equality
    check across the file boundary)."""
    from kaldi_tpu.core.table import SequentialTableReader
    from kaldi_tpu.features import (FrameExtractionOptions,
                                    MelBanksOptions, Mfcc, MfccOptions)
    from kaldi_tpu.pipelines.data import (make_synthetic_dataset,
                                          yesno_lexicon)

    work = str(tmp_path / "w2")
    lex = yesno_lexicon()
    dpath = wav_recipe.prepare_corpus(work, "train", lex, 4, seed=3)
    wav_recipe.make_mfcc(dpath, os.path.join(work, "mfcc"))
    d = read_data_dir(dpath)
    got = {u: np.asarray(m) for u, m in SequentialTableReader(
        f"scp:{os.path.join(dpath, 'feats.scp')}", holder="mat")}

    ds = make_synthetic_dataset(lex, num_utts=4, max_words=4, seed=3)
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(samp_freq=8000.0, dither=0.0),
        mel_opts=MelBanksOptions(num_bins=15), num_ceps=10))
    for u in ds.utts:
        # file path quantizes to int16; match that on the direct path
        w = np.clip(ds.wavs[u][0], -1.0, 1.0)
        w = (w * 32767.0).astype(np.int16).astype(np.float32)
        ref = np.asarray(mfcc.compute(w))
        np.testing.assert_allclose(got[u], ref, atol=1e-3)
