"""Full-lattice word alignment (word-align-lattice equivalent).

Oracles: path-set and weight preservation (RandEquivalent's role,
exhaustive here), per-arc pronunciation exactness, and agreement of
aligned-lattice best-path times with the 1-best CTM realignment.
"""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, \
    TransitionModel
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, \
    make_unigram_arpa, mkgraph
from kaldi_tpu.fst.csr import pack_fst
from kaldi_tpu.lattice import determinize_lattice
from kaldi_tpu.lattice.ctm import best_path_ctm, lang_prons
from kaldi_tpu.lattice.word_align import (lattice_word_times,
                                          word_align_lattice)


@pytest.fixture(scope="module")
def setup():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"]),
                           ("YE", ["Y", "EH"]), ("SNOW", ["S", "N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa(
        {"YES": 1.0, "NO": 1.0, "YE": 0.5, "SNOW": 0.5}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                   self_loop_scale=1.0)
    dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=1e9,
                                        max_active=HCLG.num_states,
                                        acoustic_scale=1.0,
                                        lattice_beam=8.0,
                                        lattice_arcs_per_frame=512))
    return lang, tm, dec


def _clat_paths(clat):
    """(word tuple) → min total cost, plus per-path tids."""
    out = {}

    def go(s, words, tids, cost):
        if s in clat.finals:
            gc, ac, ftids = clat.finals[s]
            key = tuple(words)
            c = cost + gc + ac
            if c < out.get(key, (np.inf, None))[0]:
                out[key] = (c, tuple(tids) + tuple(ftids))
        for a in clat.arcs[s]:
            go(a.nextstate, words + ([a.word] if a.word else []),
               list(tids) + list(a.tids), cost + a.total)

    go(clat.start, [], [], 0.0)
    return out


@pytest.mark.parametrize("seed", range(4))
def test_word_align_preserves_paths(setup, seed):
    lang, tm, dec = setup
    rng = np.random.default_rng(seed)
    T = 14
    ll = rng.standard_normal((T, tm.num_pdfs)).astype(np.float32)
    lat = dec.decode_lattice(ll)
    clat = determinize_lattice(lat)
    aligned, ok = word_align_lattice(clat, tm, lang_prons(lang),
                                     set(lang.silence_phones))
    assert ok
    p1 = _clat_paths(clat)
    p2 = _clat_paths(aligned)
    assert set(p1) == set(p2)
    for k in p1:
        assert abs(p1[k][0] - p2[k][0]) < 1e-3
        assert p1[k][1] == p2[k][1]      # tid sequences preserved


@pytest.mark.parametrize("seed", range(4))
def test_word_align_arc_exactness(setup, seed):
    """Every aligned arc is exactly one pronunciation or one silence
    run."""
    lang, tm, dec = setup
    prons = lang_prons(lang)
    sil = set(lang.silence_phones)
    rng = np.random.default_rng(100 + seed)
    ll = rng.standard_normal((12, tm.num_pdfs)).astype(np.float32)
    clat = determinize_lattice(dec.decode_lattice(ll))
    aligned, ok = word_align_lattice(clat, tm, prons, sil)
    assert ok
    from kaldi_tpu.lattice.ctm import phone_runs
    n_word_arcs = 0
    for s in range(aligned.num_states):
        for a in aligned.arcs[s]:
            phones = [p for p, _ in phone_runs(tm, a.tids)]
            if a.word:
                n_word_arcs += 1
                assert phones in prons[a.word], (a.word, phones)
            else:
                assert all(p in sil for p in phones), phones
    assert n_word_arcs > 0


def test_word_times_match_ctm(setup):
    lang, tm, dec = setup
    prons = lang_prons(lang)
    sil = set(lang.silence_phones)
    rng = np.random.default_rng(77)
    ll = rng.standard_normal((16, tm.num_pdfs)).astype(np.float32)
    clat = determinize_lattice(dec.decode_lattice(ll))
    ctm = best_path_ctm(clat, tm, lang.words, "utt", sil, prons=prons)
    aligned, ok = word_align_lattice(clat, tm, prons, sil)
    assert ok
    words, tids, cost = aligned.best_path()
    # walk the aligned best path for times
    times = []
    order = aligned.top_order()
    INF = float("inf")
    dist = [INF] * aligned.num_states
    back = [None] * aligned.num_states
    dist[aligned.start] = 0.0
    for s in order:
        if dist[s] == INF:
            continue
        for a in aligned.arcs[s]:
            nd = dist[s] + a.total
            if nd < dist[a.nextstate]:
                dist[a.nextstate] = nd
                back[a.nextstate] = (s, a)
    best_s = min(aligned.finals,
                 key=lambda s: dist[s] + aligned.finals[s][0]
                 + aligned.finals[s][1])
    arcs = []
    s = best_s
    while s != aligned.start:
        ps, a = back[s]
        arcs.append(a)
        s = ps
    arcs.reverse()
    t = 0
    for a in arcs:
        if a.word:
            times.append((lang.words.find(a.word), t, len(a.tids)))
        t += len(a.tids)
    got = [(w, b, d) for w, b, d in times]
    ref = [(e.word, round(e.begin / 0.01), round(e.duration / 0.01))
           for e in ctm]
    assert got == ref
