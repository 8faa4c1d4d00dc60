"""Recipe pipelines (reference L10/L11: binaries + steps/*.sh)."""

from kaldi_tpu.pipelines.data import (
    DataSet,
    SyntheticSpeech,
    make_synthetic_dataset,
    yesno_lexicon,
)
from kaldi_tpu.pipelines.score import WerStats, compute_wer, edit_distance
from kaldi_tpu.pipelines.mono import MonoModel, MonoTrainConfig, train_mono
from kaldi_tpu.pipelines.decode import DecodeResult, decode_gmm

__all__ = [
    "DataSet", "SyntheticSpeech", "make_synthetic_dataset", "yesno_lexicon",
    "WerStats", "compute_wer", "edit_distance",
    "MonoModel", "MonoTrainConfig", "train_mono",
    "DecodeResult", "decode_gmm",
]
