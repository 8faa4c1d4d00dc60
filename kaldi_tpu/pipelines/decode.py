"""Decode pipeline: features → acoustic scores → beam search → WER.

Parity target: steps/decode.sh → gmm-latgen-faster (SURVEY.md §3.3).
Utterances decode as device batches (the fork's
BatchedThreadedNnet3CudaPipeline role); WER via pipelines/score.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from kaldi_tpu.core.logging import get_logger
from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.fst.csr import pack_fst
from kaldi_tpu.fst.fst import VectorFst
from kaldi_tpu.fst.lang import Lang
from kaldi_tpu.pipelines.score import WerStats, compute_wer

log = get_logger(__name__)


@dataclasses.dataclass
class DecodeResult:
    hyps: Dict[str, List[str]]
    alignments: Dict[str, List[int]]
    costs: Dict[str, float]
    wer: Optional[WerStats] = None
    lattices: Optional[Dict[str, object]] = None   # utt → CompactLattice


def decode_gmm_lattice(feats: Dict[str, np.ndarray], am: AmDiagGmm,
                       tm: TransitionModel, HCLG: VectorFst, lang: Lang,
                       beam: float = 16.0, lattice_beam: float = 8.0,
                       acoustic_scale: float = 0.1,
                       refs: Optional[Dict[str, List[str]]] = None
                       ) -> DecodeResult:
    """gmm-latgen-faster equivalent: decode with CompactLattice output."""
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.lattice import determinize_lattice

    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=beam,
                                          lattice_beam=lattice_beam,
                                          acoustic_scale=acoustic_scale))
    hyps, alignments, costs, lats = {}, {}, {}, {}
    for u in sorted(feats):
        ll = np.asarray(am.loglikes(feats[u]))
        lat, best = dec.decode_lattice(ll)
        clat = determinize_lattice(lat)
        words, tids, cost = clat.best_path()
        hyps[u] = [lang.words.find(w) for w in words]
        alignments[u] = tids
        costs[u] = cost
        lats[u] = clat
    result = DecodeResult(hyps, alignments, costs, lattices=lats)
    if refs is not None:
        result.wer = compute_wer(refs, hyps)
        log.info("decode(lattice): %s", result.wer)
    return result


def decode_gmm(feats: Dict[str, np.ndarray], am: AmDiagGmm,
               tm: TransitionModel, HCLG: VectorFst, lang: Lang,
               config: BeamDecoderConfig = None,
               refs: Optional[Dict[str, List[str]]] = None,
               batch_size: int = 8) -> DecodeResult:
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    cfg = config or BeamDecoderConfig(beam=16.0, max_active=2000,
                                      acoustic_scale=0.1)
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=cfg.beam,
                                          acoustic_scale=cfg.acoustic_scale))
    utts = sorted(feats)
    hyps: Dict[str, List[str]] = {}
    alignments: Dict[str, List[int]] = {}
    costs: Dict[str, float] = {}
    P = am.num_pdfs
    # one fixed (B, T_bucket) shape for the whole run → one compilation
    T_all = ((max(feats[u].shape[0] for u in utts) + 255) // 256) * 256
    for i in range(0, len(utts), batch_size):
        chunk = utts[i:i + batch_size]
        lls = [np.asarray(am.loglikes(feats[u])) for u in chunk]
        batch = np.zeros((batch_size, T_all, P), np.float32)
        lens = np.ones(batch_size, np.int32)
        for b, l in enumerate(lls):
            batch[b, :l.shape[0]] = l
            lens[b] = l.shape[0]
        for u, (tids, ols, cost) in zip(
                chunk, dec.decode_batch(batch, lens)[:len(chunk)]):
            hyps[u] = [lang.words.find(o) for o in ols]
            alignments[u] = tids
            costs[u] = cost
    result = DecodeResult(hyps, alignments, costs)
    if refs is not None:
        result.wer = compute_wer(refs, hyps)
        log.info("decode: %s", result.wer)
    return result
