"""Pallas TPU kernels for the hot compute paths (SURVEY.md §7 step 10).

These replace what the reference implements as CUDA kernels
(src/cudamatrix/cu-kernels.cu, src/cudafeat/): the fused feature
frontend and batched GMM log-likelihood evaluation.  Each kernel has an
XLA-composed twin used as the correctness oracle and as the fallback on
unsupported shapes.
"""

from kaldi_tpu.ops.pallas_gmm import gmm_loglikes_pallas, gmm_loglikes_xla
from kaldi_tpu.ops.pallas_frontend import fbank_pallas, fbank_xla

__all__ = ["gmm_loglikes_pallas", "gmm_loglikes_xla",
           "fbank_pallas", "fbank_xla"]
