"""Data handling: data "directories" and synthetic test corpora.

The reference's data contract is a directory of {wav.scp, text, utt2spk,
spk2utt} (egs/wsj/s5/utils/validate_data_dir.sh); DataSet mirrors that
in memory with the same field names.

Because this environment has no audio corpora and no network, the
recipes' smoke corpora (egs/yesno — 60 wavs of spoken yes/no) are
replaced by SYNTHETIC equivalents: each phone is given a distinct
formant-like spectral signature, words are rendered as phone sequences
with random durations/noise, so the full pipeline (features → GMM
training → HCLG → decode) runs end-to-end with a known transcript and
achievable WER 0.0 — the same role yesno's run.sh plays as the
reference's canonical integration test (SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from kaldi_tpu.fst.lang import Lexicon


@dataclasses.dataclass
class DataSet:
    """In-memory data dir: utt → waveform/text/speaker."""
    wavs: Dict[str, Tuple[np.ndarray, int]]
    text: Dict[str, List[str]]
    utt2spk: Dict[str, str]

    @property
    def utts(self) -> List[str]:
        return sorted(self.wavs)

    def spk2utt(self) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for u, s in self.utt2spk.items():
            out.setdefault(s, []).append(u)
        return out

    def split(self, nj: int) -> List["DataSet"]:
        """utils/split_data.sh: shard by speaker for CMVN consistency."""
        spk2utt = self.spk2utt()
        shards: List[DataSet] = [DataSet({}, {}, {}) for _ in range(nj)]
        for i, spk in enumerate(sorted(spk2utt)):
            sh = shards[i % nj]
            for u in spk2utt[spk]:
                sh.wavs[u] = self.wavs[u]
                sh.text[u] = self.text[u]
                sh.utt2spk[u] = spk
        return [s for s in shards if s.wavs]


# ---------------------------------------------------------------------------
# Synthetic corpus
# ---------------------------------------------------------------------------

# Formant-like frequency pairs per phone (Hz); distinct and well inside
# a 8 kHz Nyquist band.
_DEFAULT_FORMANTS = [
    (300, 2300), (500, 1000), (700, 1800), (400, 3000), (900, 1400),
    (250, 1700), (600, 2600), (800, 1100), (350, 2000), (1000, 2900),
    (450, 1300), (550, 2200), (750, 3200), (650, 900), (950, 2500),
    (300, 1500), (500, 2800), (850, 1900), (400, 1200), (1100, 2100),
]


class SyntheticSpeech:
    """Renders word sequences to waveforms from per-phone formants."""

    def __init__(self, lexicon: Lexicon, sil_phone: str = "SIL",
                 samp_freq: int = 8000):
        self.lexicon = lexicon
        self.samp_freq = samp_freq
        self.pron = {w: pron for w, pron in lexicon.entries}
        phones = sorted({p for _, pron in lexicon.entries for p in pron})
        self.formants: Dict[str, Tuple[float, float]] = {}
        for i, p in enumerate(phones):
            self.formants[p] = _DEFAULT_FORMANTS[i % len(_DEFAULT_FORMANTS)]
        self.sil_phone = sil_phone

    def render_phone(self, phone: str, dur_s: float, rng) -> np.ndarray:
        n = int(dur_s * self.samp_freq)
        t = np.arange(n) / self.samp_freq
        if phone == self.sil_phone:
            return (0.01 * rng.standard_normal(n)).astype(np.float32)
        f1, f2 = self.formants[phone]
        sig = (0.5 * np.sin(2 * math.pi * f1 * t + rng.uniform(0, 6.28))
               + 0.3 * np.sin(2 * math.pi * f2 * t + rng.uniform(0, 6.28)))
        # amplitude envelope + noise
        env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n))
                         / (0.01 * self.samp_freq + 1))
        sig = sig * env + 0.02 * rng.standard_normal(n)
        return (0.3 * sig).astype(np.float32)

    def render_words(self, words: Sequence[str], rng,
                     phone_dur: Tuple[float, float] = (0.10, 0.18),
                     sil_dur: Tuple[float, float] = (0.08, 0.15)
                     ) -> np.ndarray:
        parts = [self.render_phone(self.sil_phone,
                                   rng.uniform(*sil_dur), rng)]
        for w in words:
            for p in self.pron[w]:
                parts.append(self.render_phone(p, rng.uniform(*phone_dur), rng))
            parts.append(self.render_phone(self.sil_phone,
                                           rng.uniform(*sil_dur), rng))
        return np.concatenate(parts)


def make_synthetic_dataset(lexicon: Lexicon, num_utts: int,
                           min_words: int = 1, max_words: int = 6,
                           num_speakers: int = 4, seed: int = 0,
                           samp_freq: int = 8000) -> DataSet:
    rng = np.random.default_rng(seed)
    synth = SyntheticSpeech(lexicon, samp_freq=samp_freq)
    vocab = sorted(synth.pron)
    wavs, text, utt2spk = {}, {}, {}
    for i in range(num_utts):
        spk = f"spk{i % num_speakers}"
        utt = f"{spk}_utt{i:03d}"
        n = int(rng.integers(min_words, max_words + 1))
        words = [vocab[int(rng.integers(len(vocab)))] for _ in range(n)]
        wavs[utt] = (synth.render_words(words, rng), samp_freq)
        text[utt] = words
        utt2spk[utt] = spk
    return DataSet(wavs, text, utt2spk)


def yesno_lexicon() -> Lexicon:
    return Lexicon(entries=[
        ("YES", ["Y", "EH", "S"]),
        ("NO", ["N", "OW"]),
    ])
