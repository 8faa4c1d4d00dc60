"""Headline benchmark: batched GMM decode throughput in audio-seconds
per wall-second on one chip.

Mirrors the BASELINE.md reference point: the C++ LatticeFasterDecoder
runs ≈0.5–1.5× real-time per CPU core at beam 13 / max-active 7000;
vs_baseline is computed against 1.0 audio-s/s (1× real-time single
core).  The measured path is the full decode stack: framing → MFCC →
GMM loglikes → vectorized WFST beam search (batch of utterances), all
on device, excluding one warm-up compile.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_task(num_words=100, num_phones=20, seed=0):
    from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
        make_unigram_arpa, mkgraph

    rng = np.random.default_rng(seed)
    phones = [f"P{i}" for i in range(num_phones)]
    entries = []
    seen = set()
    for w in range(num_words):
        n = int(rng.integers(2, 5))
        pron = tuple(phones[int(rng.integers(num_phones))] for _ in range(n))
        entries.append((f"W{w}", list(pron)))
    lex = Lexicon(entries=entries)
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa(
        {f"W{w}": 1.0 for w in range(num_words)}))
    G = arpa_to_fst(arpa, lang.words)
    HCLG = mkgraph(lang, tm, G)

    # GMM with 8 mixtures per pdf, random parameters (decode speed does
    # not depend on model quality)
    P, M, D = tree.num_pdfs, 8, 39
    weights = rng.dirichlet(np.ones(M), size=P)
    means = rng.standard_normal((P, M, D)) * 3
    variances = 0.5 + rng.random((P, M, D))
    am = AmDiagGmm(weights, means, variances)
    return lang, tm, am, HCLG


def main():
    from kaldi_tpu.core.logging import get_logger
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig, \
        pack_reverse
    from kaldi_tpu.features import DeltaFeaturesOptions, \
        FrameExtractionOptions, MfccOptions
    from kaldi_tpu.features.batch import BatchedFrontend, GmmDecodableProvider
    import jax

    log = get_logger("bench")
    lang, tm, am, HCLG = build_task()
    dec = DenseDecoder(pack_reverse(HCLG), tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=13.0, acoustic_scale=0.1))
    frontend = BatchedFrontend(
        MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0)),
        deltas=DeltaFeaturesOptions())
    provider = GmmDecodableProvider(frontend, am)

    B, dur_s, sr = 256, 10.0, 16000
    rng = np.random.default_rng(1)
    waves = rng.standard_normal((B, int(dur_s * sr))).astype(np.float32) * 1000
    T = frontend.num_frames(waves.shape[1])
    lens = np.full(B, T, np.int32)

    def run_once():
        loglikes = provider(waves)      # fused frontend+GMM, one jit
        return dec.decode_batch(loglikes, lens)

    log.info("bench: warmup (compile)...")
    run_once()
    log.info("bench: timing...")
    # best-of-N: the TPU tunnel shares bandwidth with other tenants, so
    # the min wall time is the honest device throughput
    n_rep = 4
    dt = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = run_once()
        dt = min(dt, time.perf_counter() - t0)
    audio_s = B * dur_s
    value = audio_s / dt
    baseline = 1.0  # 1x real-time per C++ CPU core (BASELINE.md)
    print(json.dumps({
        "metric": "gmm_decode_throughput",
        "value": round(value, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
