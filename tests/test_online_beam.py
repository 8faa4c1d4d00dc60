"""OnlineBeamDecoder: streamed large-graph decode == offline."""

import numpy as np
import pytest

from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.decoder.online_beam import OnlineBeamDecoder


@pytest.fixture(scope="module")
def task():
    from kaldi_tpu.pipelines.largevocab import make_largevocab_task
    return make_largevocab_task(vocab_size=800, corpus_sentences=800,
                                seed=3)


@pytest.fixture(scope="module")
def dec(task):
    return BeamDecoder(task.graph.csr, task.tm.tid_to_pdf_array,
                       BeamDecoderConfig(beam=14.0, max_active=512,
                                         acoustic_scale=1.0,
                                         lattice_beam=6.0,
                                         lattice_arcs_per_frame=1024,
                                         record_capacity=16384))


def _utt(task, rng, n_words=4):
    from kaldi_tpu.pipelines.largevocab import (sample_eval_set,
                                                synth_loglikes)
    words = list(sample_eval_set(task, 1, max_words=n_words,
                                 seed=int(rng.integers(1 << 30))
                                 ).values())[0]
    return words, synth_loglikes(task, words, rng, noise=0.3)


def test_streamed_matches_offline(task, dec):
    rng = np.random.default_rng(5)
    ob = OnlineBeamDecoder(dec, chunk_frames=16, max_frames=512)
    for trial in range(3):
        words, ll = _utt(task, rng)
        ref = dec.decode_compact(ll, bucket=1)
        ob.reset()
        # ragged chunk sizes, incl. a mid-stream partial (flush +
        # resume path)
        cuts = [0, 7, 23, 40, ll.shape[0]]
        for a, b in zip(cuts, cuts[1:]):
            if a < ll.shape[0]:
                ob.advance(ll[a:min(b, ll.shape[0])])
            if a == 23:
                ob.partial()          # traceback mid-stream
        got = ob.finalize()
        gw, gt, gc = got.best_path()
        rw, rt, rc = ref.best_path()
        assert gw == rw and gt == rt and abs(gc - rc) < 1e-3
        assert dict(got.paths()) == pytest.approx(dict(ref.paths()),
                                                  abs=1e-3)


def test_partial_converges_to_final(task, dec):
    rng = np.random.default_rng(9)
    words, ll = _utt(task, rng)
    ob = OnlineBeamDecoder(dec, chunk_frames=16, max_frames=512)
    ob.reset()
    T = ll.shape[0]
    ob.advance(ll[:T // 2])
    mid_ols, mid_cost = ob.partial()
    assert np.isfinite(mid_cost)
    ob.advance(ll[T // 2:])
    end_ols, end_cost = ob.partial()
    clat = ob.finalize()
    bw, bt, bc = clat.best_path()
    assert end_ols == bw                 # partial at end == best path
    # decoded transcript matches the synthesized sentence
    hyp = [task.words.find(w) for w in bw]
    assert hyp == list(words)
    # a second utterance after reset is independent
    words2, ll2 = _utt(task, rng)
    ob.reset()
    ob.advance(ll2)
    clat2 = ob.finalize()
    hyp2 = [task.words.find(w) for w in clat2.best_path()[0]]
    assert hyp2 == list(words2)


def test_partial_tids_monotone_prefix(task, dec):
    rng = np.random.default_rng(21)
    _, ll = _utt(task, rng)
    ob = OnlineBeamDecoder(dec, chunk_frames=16, max_frames=512)
    ob.reset()
    ob.advance(ll)
    tids = ob.partial_tids()
    assert len(tids) == ll.shape[0]      # one tid per decoded frame
    ref_tids, _ols, _c = dec.decode(ll)
    assert tids == ref_tids


def test_endpoint_and_best_path_surface(task, dec):
    """The SingleUtteranceNnet3Decoder-compatible surface: endpointing
    from trailing silence + relative cost, get_best_path parity."""
    rng = np.random.default_rng(33)
    words, ll = _utt(task, rng)
    ob = OnlineBeamDecoder(dec, chunk_frames=16, max_frames=512)
    ob.reset()
    ob.advance(ll)
    tids, ols, cost = ob.get_best_path()
    rt, ro, rc = dec.decode(ll)
    assert tids == rt and ols == ro and abs(cost - rc) < 1e-3
    # rule5 fires on pure utterance length (>20 s at 0.03 shift needs
    # 667 frames; at frame_shift=1.0 any utterance >20 frames fires)
    assert ob.endpoint_detected(frame_shift=1.0)
    # with a huge min length and silence requirements unmet, no rule
    # fires at the default shift for a short utterance
    from kaldi_tpu.decoder.online import OnlineEndpointRule
    assert not ob.endpoint_detected(
        rules=[OnlineEndpointRule(True, 1e9, 1e10, 1e9)])


def test_multistream_channels_match_offline(task, dec):
    """4 channels streaming staggered utterances of different lengths;
    every finalized lattice must equal the offline fused path, and a
    reset lane must decode a second utterance correctly."""
    from kaldi_tpu.decoder.online_beam import MultiStreamBeamDecoder
    rng = np.random.default_rng(41)
    ms = MultiStreamBeamDecoder(dec, n_channels=4, chunk_frames=16,
                                max_frames=256)
    utts = [_utt(task, rng) for _ in range(6)]   # 6 utts over 4 lanes
    queue = list(range(6))
    active = {}                                  # channel → (utt, pos)
    done = {}
    while queue or active:
        for c in range(4):
            if c not in active and queue:
                active[c] = (queue.pop(0), 0)
        chunks = [None] * 4
        for c, (u, pos) in active.items():
            ll = utts[u][1]
            chunks[c] = ll[pos:pos + 16]
        ms.advance(chunks)
        for c in list(active):
            u, pos = active[c]
            pos += len(chunks[c]) if chunks[c] is not None else 0
            if pos >= utts[u][1].shape[0]:
                done[u] = ms.finalize_channel(c)
                ms.reset_channel(c)
                del active[c]
            else:
                active[c] = (u, pos)
    assert len(done) == 6
    for u, (words, ll) in enumerate(utts):
        ref = dec.decode_compact(ll, bucket=1)
        gw, gt, gc = done[u].best_path()
        rw, rt, rc = ref.best_path()
        assert gw == rw and gt == rt and abs(gc - rc) < 1e-3
