"""Lattice post-processing (reference L8: src/lat/, src/lm/ rescoring)."""

from kaldi_tpu.lattice.lattice import (
    CompactArc,
    CompactLattice,
    Lattice,
    LatticeArc,
)
from kaldi_tpu.lattice.determinize import determinize_lattice, prune_lattice
from kaldi_tpu.lattice.functions import (
    MbrResult,
    forward_backward_post,
    mbr_decode,
    nbest,
    scale_lattice,
    state_times,
)
from kaldi_tpu.lattice.rescore import (compose_lm, compose_lm_pruned,
                                       lmrescore, lmrescore_pruned)

__all__ = ["CompactArc", "CompactLattice", "Lattice", "LatticeArc",
           "determinize_lattice", "prune_lattice", "MbrResult",
           "forward_backward_post", "mbr_decode", "nbest", "scale_lattice",
           "state_times", "compose_lm", "lmrescore",
           "compose_lm_pruned", "lmrescore_pruned"]
