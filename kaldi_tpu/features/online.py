"""Online (streaming) feature extraction.

Parity targets: src/feat/online-feature.h (OnlineMfcc/OnlineFbank,
OnlineCmvn, OnlineDeltaFeature, OnlineSpliceFrames) and
src/online2/online-nnet2-feature-pipeline.h (OnlineNnet2FeaturePipeline).

The pipeline accepts waveform chunks of any size and exposes frames as
they become computable.  Key reference semantics preserved:
  - a frame is ready once its full window of samples has arrived
  - online CMVN subtracts a mean from frozen global stats, updated with
    a sliding window of seen frames (OnlineCmvn with global fallback)
  - deltas/splicing need future context, so the ready-frame count lags
    by the right-context (OnlineDeltaFeature::NumFramesReady)

Offline-vs-online equality on the same waveform is the contract the
reference tests (src/feat/online-feature-test.cc) and ours do too.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from kaldi_tpu.core.logging import KaldiError
from kaldi_tpu.features.compute import Mfcc, MfccOptions, Fbank, FbankOptions
from kaldi_tpu.features.functions import DeltaFeaturesOptions, add_deltas, \
    splice_frames
from kaldi_tpu.features.window import num_frames as calc_num_frames


@dataclasses.dataclass
class OnlineCmvnOptions:
    cmn_window: int = 600
    normalize_variance: bool = False
    # global stats (2, D+1) from training data; required here (the
    # reference can also run without, using speaker stats)
    global_stats: Optional[np.ndarray] = None


class OnlineFeaturePipeline:
    """waveform chunks → base features (+CMVN, deltas or splicing)."""

    def __init__(self, computer, cmvn: Optional[OnlineCmvnOptions] = None,
                 deltas: Optional[DeltaFeaturesOptions] = None,
                 splice: Optional[tuple] = None,
                 ivector_estimator=None, ivector_period: int = 10):
        """ivector_estimator: an am.ivector.OnlineIvectorEstimator — when
        given, the current i-vector (re-estimated every ivector_period
        frames, from RAW pre-CMVN frames as the reference does) is
        appended to each output frame (the OnlineIvectorFeature input of
        online-nnet2-feature-pipeline.h)."""
        self.computer = computer
        self.cmvn = cmvn
        self.delta_opts = deltas
        self.splice_ctx = splice
        if deltas is not None and splice is not None:
            raise KaldiError("use deltas or splicing, not both")
        self.ivector_estimator = ivector_estimator
        self.ivector_period = ivector_period
        self._ivectors: List[np.ndarray] = []   # per period-block
        self._wave = np.zeros(0, np.float32)
        self._frames: List[np.ndarray] = []     # raw computed frames
        self._input_finished = False

    # -- input -------------------------------------------------------------
    def accept_waveform(self, samples: np.ndarray) -> None:
        if self._input_finished:
            raise KaldiError("accept_waveform after input_finished")
        self._wave = np.concatenate([self._wave,
                                     np.asarray(samples, np.float32)])
        self._compute_ready()

    def input_finished(self) -> None:
        self._input_finished = True
        self._compute_ready()

    def _compute_ready(self) -> None:
        opts = self.computer.frame_opts
        total = calc_num_frames(len(self._wave), opts)
        have = len(self._frames)
        if total > have:
            # compute only the new frames; frame f needs samples up to
            # f*shift + window — recompute from the earliest needed sample
            first_sample = have * opts.window_shift
            segment = self._wave[first_sample:]
            feats = self.computer.compute(segment)
            for i in range(total - have):
                self._frames.append(np.asarray(feats[i]))
            if self.ivector_estimator is not None:
                self._update_ivectors()

    # -- output ------------------------------------------------------------
    @property
    def right_context(self) -> int:
        if self.delta_opts is not None:
            return self.delta_opts.order * self.delta_opts.window
        if self.splice_ctx is not None:
            return self.splice_ctx[1]
        return 0

    def num_frames_ready(self) -> int:
        n = len(self._frames)
        if self._input_finished:
            return n
        return max(0, n - self.right_context)

    def get_frames(self, begin: int, end: int) -> np.ndarray:
        """Frames [begin, end) of the FINAL feature stream."""
        if end > self.num_frames_ready():
            raise KaldiError("frames not ready")
        raw = np.stack(self._frames) if self._frames else \
            np.zeros((0, self.computer.dim), np.float32)
        out = raw
        if self.cmvn is not None:
            out = self._apply_online_cmvn(out)
        if self.delta_opts is not None:
            out = np.asarray(add_deltas(out, self.delta_opts))
        elif self.splice_ctx is not None:
            out = np.asarray(splice_frames(out, *self.splice_ctx))
        out = out[begin:end]
        if self.ivector_estimator is not None:
            out = np.concatenate(
                [out, self._ivector_rows(begin, end)], axis=1)
        return out

    def set_frame_weights(self, weights: np.ndarray) -> None:
        """Silence-weighting hook: revise the i-vector estimator's
        per-frame weights (computed by OnlineSilenceWeighting from the
        decoder's partial traceback).  Affects FUTURE block estimates —
        the online protocol, matching the reference's greedy update."""
        if self.ivector_estimator is not None:
            self.ivector_estimator.update_frame_weights(weights)

    def _update_ivectors(self) -> None:
        """Snapshot the i-vector at every period boundary as raw frames
        arrive (frame t reads the estimate from frames < its block's
        end — online causal re-estimation every ivector_period)."""
        est = self.ivector_estimator
        period = self.ivector_period
        n = len(self._frames)
        while (len(self._ivectors) + 1) * period <= n:
            boundary = (len(self._ivectors) + 1) * period
            if boundary > est.num_frames:
                est.accept_frames(
                    np.stack(self._frames[est.num_frames:boundary]))
            self._ivectors.append(np.asarray(est.ivector(), np.float32))

    def _ivector_rows(self, begin: int, end: int) -> np.ndarray:
        est = self.ivector_estimator
        period = self.ivector_period
        # frames past the last complete block use the current estimate
        n = len(self._frames)
        if n > est.num_frames:
            est.accept_frames(np.stack(self._frames[est.num_frames:]))
        current = np.asarray(est.ivector(), np.float32)
        out = np.zeros((end - begin, est.ex.ivector_dim), np.float32)
        for t in range(begin, end):
            block = t // period
            out[t - begin] = (self._ivectors[block]
                              if block < len(self._ivectors) else current)
        return out

    def _apply_online_cmvn(self, feats: np.ndarray) -> np.ndarray:
        o = self.cmvn
        T, D = feats.shape
        out = np.empty_like(feats)
        gstats = o.global_stats
        for t in range(T):
            lo = max(0, t + 1 - o.cmn_window)
            window = feats[lo:t + 1]
            count = len(window)
            s = window.sum(axis=0)
            if gstats is not None and count < o.cmn_window:
                # pad with global stats up to the window size
                need = o.cmn_window - count
                gcount = gstats[0, D]
                s = s + gstats[0, :D] * (need / gcount)
                count += need
            out[t] = feats[t] - s / count
        return out


def make_online_mfcc_pipeline(opts: MfccOptions = None,
                              cmvn_stats: Optional[np.ndarray] = None,
                              deltas: bool = True) -> OnlineFeaturePipeline:
    computer = Mfcc(opts or MfccOptions())
    cmvn = OnlineCmvnOptions(global_stats=cmvn_stats) \
        if cmvn_stats is not None else None
    return OnlineFeaturePipeline(
        computer, cmvn=cmvn,
        deltas=DeltaFeaturesOptions() if deltas else None)
