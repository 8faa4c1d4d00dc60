"""Feature frontend (reference layer L4: src/feat/, parts of src/transform/)."""

from kaldi_tpu.features.window import (
    FrameExtractionOptions,
    extract_frames,
    feature_window_function,
    num_frames,
)
from kaldi_tpu.features.mel import MelBanks, MelBanksOptions
from kaldi_tpu.features.compute import (
    Fbank,
    FbankOptions,
    Mfcc,
    MfccOptions,
    Plp,
    PlpOptions,
    Spectrogram,
    SpectrogramOptions,
    compute_dct_matrix,
)
from kaldi_tpu.features.functions import (
    DeltaFeaturesOptions,
    SlidingWindowCmnOptions,
    add_deltas,
    sliding_window_cmn,
    splice_frames,
)
from kaldi_tpu.features.cmvn import apply_cmvn, compute_cmvn_stats, sum_cmvn_stats

__all__ = [
    "FrameExtractionOptions", "extract_frames", "feature_window_function",
    "num_frames", "MelBanks", "MelBanksOptions",
    "Mfcc", "MfccOptions", "Fbank", "FbankOptions",
    "Plp", "PlpOptions", "Spectrogram", "SpectrogramOptions",
    "compute_dct_matrix", "DeltaFeaturesOptions", "add_deltas",
    "splice_frames", "SlidingWindowCmnOptions", "sliding_window_cmn",
    "apply_cmvn", "compute_cmvn_stats", "sum_cmvn_stats",
]
