"""Acoustic models (reference L5: src/{gmm,tree,hmm,nnet3,chain}/)."""

from kaldi_tpu.am.topology import NO_PDF, HmmState, HmmTopology
from kaldi_tpu.am.tree import (
    ContextDependency,
    MonophoneContextDependency,
    TreeContextDependency,
    GaussStats,
    build_tree,
)
from kaldi_tpu.am.transitions import TransitionModel

__all__ = [
    "NO_PDF", "HmmState", "HmmTopology",
    "ContextDependency", "MonophoneContextDependency",
    "TreeContextDependency", "GaussStats", "build_tree",
    "TransitionModel",
]
