"""CLI bank 21: latbin determinization/alignment tail, parallel decode
variants, raw-lattice tables, featbin/lmbin stragglers."""

import math

import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.fst.fst import Arc, VectorFst
from kaldi_tpu.lattice.lattice import (CompactArc, CompactLattice,
                                       Lattice, LatticeArc)


@pytest.fixture
def rng():
    return np.random.default_rng(21)


def _clat():
    """Two branches with the same word sequence (1,) — determinizable
    — plus a distinct word (2,) branch."""
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(1, 1.0, 0.5, (11, 12), s[1]))
    c.arcs[s[0]].append(CompactArc(1, 2.0, 0.5, (11, 12), s[1]))
    c.arcs[s[0]].append(CompactArc(2, 2.0, 0.5, (21, 22), s[1]))
    c.arcs[s[1]].append(CompactArc(3, 0.5, 0.5, (31,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    return c


def _raw_lat():
    """Raw lattice: two tid paths for the same word, one for another."""
    lat = Lattice()
    s = [lat.add_state() for _ in range(4)]
    lat.start = s[0]
    lat.arcs[s[0]].append(LatticeArc(11, 1, 1.0, 0.5, s[1]))
    lat.arcs[s[0]].append(LatticeArc(11, 1, 2.0, 0.5, s[2]))
    lat.arcs[s[1]].append(LatticeArc(12, 0, 0.0, 0.4, s[3]))
    lat.arcs[s[2]].append(LatticeArc(12, 0, 0.0, 0.4, s[3]))
    lat.finals[s[3]] = (0.1, 0.0)
    return lat


def _mdl(tmp_path, rng):
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    P, M, D = tree.num_pdfs, 2, 3
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "0.mdl")
    write_mdl(path, tm, am)
    return path, tm


# ---------------------------------------------------------------------------
# latbin determinization tail
# ---------------------------------------------------------------------------

def test_determinize_phone_pruned_and_parallel(tmp_path, rng):
    mdl, _tm = _mdl(tmp_path, rng)
    spec = f"ark:{tmp_path}/l.ark"
    with TableWriter(spec, holder="clat") as w:
        for i in range(5):
            w[f"u{i}"] = _clat()
    assert main(["lattice-determinize-phone-pruned", "--beam=10", mdl,
                 spec, f"ark:{tmp_path}/det.ark"]) == 0
    assert main(["lattice-determinize-phone-pruned-parallel",
                 "--beam=10", "--num-threads=3", mdl, spec,
                 f"ark:{tmp_path}/detp.ark"]) == 0
    assert main(["lattice-determinize-pruned-parallel", "--beam=10",
                 "--num-threads=2", spec,
                 f"ark:{tmp_path}/detp2.ark"]) == 0
    a = dict(SequentialTableReader(f"ark:{tmp_path}/det.ark",
                                   holder="clat"))
    b = dict(SequentialTableReader(f"ark:{tmp_path}/detp.ark",
                                   holder="clat"))
    c = dict(SequentialTableReader(f"ark:{tmp_path}/detp2.ark",
                                   holder="clat"))
    assert set(a) == set(b) == set(c) == {f"u{i}" for i in range(5)}
    for k in a:
        pa = {w: cst for w, cst in a[k].paths()}
        pb = {w: cst for w, cst in b[k].paths()}
        pc = {w: cst for w, cst in c[k].paths()}
        # duplicate (1, 3) branch merged at min cost; (2, 3) kept
        assert set(pa) == {(1, 3), (2, 3)}
        assert pa[(1, 3)] == pytest.approx(2.5)   # min branch 1.0+0.5 + 0.5+0.5
        for w in pa:
            assert pa[w] == pytest.approx(pb[w], abs=1e-5)
            assert pa[w] == pytest.approx(pc[w], abs=1e-5)


def test_determinize_non_compact_raw_tables(tmp_path):
    spec = f"ark:{tmp_path}/raw.ark"
    with TableWriter(spec, holder="lat") as w:
        w["u1"] = _raw_lat()
    # round-trip of the raw holder first
    rt = dict(SequentialTableReader(spec, holder="lat"))["u1"]
    assert rt.num_states == 4 and rt.num_arcs == 4
    assert rt.finals[3] == (pytest.approx(0.1), 0.0)
    assert main(["lattice-determinize-non-compact", spec,
                 f"ark:{tmp_path}/det.ark"]) == 0
    det = dict(SequentialTableReader(f"ark:{tmp_path}/det.ark",
                                     holder="lat"))["u1"]
    tids, words, cost = det.best_path()
    assert words == [1] and tids == [11, 12]
    assert cost == pytest.approx(1.0 + 0.5 + 0.4 + 0.1)
    # determinization merged the duplicate tid path
    assert det.num_arcs < 4


def test_lattice_copy_backoff(tmp_path):
    prim = f"ark:{tmp_path}/prim.ark"
    back = f"ark:{tmp_path}/back.ark"
    good = _clat()
    with TableWriter(prim, holder="clat") as w:
        w["u1"] = good
    fallback = CompactLattice()
    s0 = fallback.add_state()
    fallback.start = s0
    fallback.finals[s0] = (0.0, 0.0, ())
    with TableWriter(back, holder="clat") as w:
        w["u1"] = fallback
        w["u2"] = fallback
    assert main(["lattice-copy-backoff", "scp:/dev/null", prim, back,
                 f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="clat"))
    assert set(out) == {"u1", "u2"}
    assert out["u1"].num_arcs == good.num_arcs     # primary won
    assert out["u2"].num_arcs == 0                 # backoff used


def test_lattice_reverse(tmp_path):
    spec = f"ark:{tmp_path}/raw.ark"
    lat = _raw_lat()
    with TableWriter(spec, holder="lat") as w:
        w["u1"] = lat
    assert main(["lattice-reverse", spec,
                 f"ark:{tmp_path}/rev.ark"]) == 0
    rev = dict(SequentialTableReader(f"ark:{tmp_path}/rev.ark",
                                     holder="lat"))["u1"]
    t_f, w_f, c_f = lat.best_path()
    t_r, w_r, c_r = rev.best_path()
    assert c_r == pytest.approx(c_f)
    assert t_r == t_f[::-1] and w_r == w_f[::-1]


def test_lattice_align_words_lexicon(tmp_path):
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.csr import pack_fst
    from kaldi_tpu.lattice import determinize_lattice
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]),
                           ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.gmm import AmDiagGmm
    rng = np.random.default_rng(5)
    P, M, D = tree.num_pdfs, 1, 2
    am = AmDiagGmm(np.ones((P, M)), rng.standard_normal((P, M, D)),
                   np.ones((P, M, D)))
    mdl = str(tmp_path / "m.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"YES": 1.0, "NO": 1.0})), lang.words),
        self_loop_scale=1.0)
    dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=1e9, max_active=200,
                                        acoustic_scale=1.0,
                                        lattice_beam=8.0,
                                        lattice_arcs_per_frame=512))
    ll = rng.standard_normal((10, tm.num_pdfs)).astype(np.float32)
    clat = determinize_lattice(dec.decode_lattice(ll))
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u1"] = clat
    # align_lexicon.int: '<word> <word> <phone>...' (+ <eps> silence)
    lines = []
    from kaldi_tpu.lattice.ctm import lang_prons
    for wid, prons in lang_prons(lang).items():
        for pron in prons:
            lines.append(" ".join([str(wid), str(wid)]
                                  + [str(p) for p in pron]))
    for sp in lang.silence_phones:
        lines.append(f"0 0 {sp}")
    (tmp_path / "align_lexicon.int").write_text("\n".join(lines) + "\n")
    assert main(["lattice-align-words-lexicon",
                 str(tmp_path / "align_lexicon.int"), mdl,
                 f"ark:{tmp_path}/l.ark",
                 f"ark:{tmp_path}/al.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/al.ark",
                                     holder="clat"))["u1"]
    base = {w: c for w, c in clat.paths()}
    got = {w: c for w, c in out.paths()}
    assert set(base) == set(got)
    for w in base:
        assert base[w] == pytest.approx(got[w], abs=1e-3)


def test_lmrescore_rnnlm_pruned(tmp_path):
    V = 8
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="text") as w:
        for u in range(4):
            w[f"u{u}"] = [str(3 + (u + i) % 3) for i in range(4)]
    out = tmp_path / "final.rnnlm"
    assert TOOLS["rnnlm-train"](
        [f"--vocab-size={V}", "--embed-dim=4", "--hidden-dim=4",
         "--num-epochs=1", f"ark:{tmp_path}/t.ark", str(out)]) == 0
    words_txt = tmp_path / "words.txt"
    words_txt.write_text("<eps> 0\n<s> 1\n</s> 2\n" +
                         "".join(f"w{i} {i}\n" for i in range(3, V)))
    # a flat unigram as the old G to subtract
    from kaldi_tpu.fst import make_unigram_arpa
    arpa = tmp_path / "g.arpa"
    arpa.write_text(make_unigram_arpa(
        {f"w{i}": 1.0 for i in range(3, V)}))
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(3, 0.5, 1.0, (1,), s1))
    clat.arcs[s0].append(CompactArc(4, 0.5, 1.2, (2,), s1))
    clat.finals[s1] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/l.ark", holder="clat") as w:
        w["u"] = clat
    assert main(["lattice-lmrescore-kaldi-rnnlm-pruned", str(arpa),
                 str(out), str(words_txt), f"ark:{tmp_path}/l.ark",
                 f"ark:{tmp_path}/r.ark"]) == 0
    res = dict(SequentialTableReader(f"ark:{tmp_path}/r.ark",
                                     holder="clat"))["u"]
    got = {w: c for w, c in res.paths()}
    base = {w: c for w, c in clat.paths()}
    assert set(got) == {(3,), (4,)}
    assert any(abs(got[w] - base[w]) > 1e-4 for w in got)


# ---------------------------------------------------------------------------
# bin decode tail
# ---------------------------------------------------------------------------

def test_decode_faster(tmp_path):
    # 2-state loop FST: ilabel 1 emits olabel 7, ilabel 2 emits 8
    f = VectorFst()
    s0 = f.add_state()
    f.start = s0
    f.add_arc(s0, Arc(1, 7, 0.1, s0))
    f.add_arc(s0, Arc(2, 8, 0.1, s0))
    f.set_final(s0, 0.0)
    from kaldi_tpu.fst.openfst_io import write_fst_path
    write_fst_path(str(tmp_path / "g.fst"), f)
    # loglike columns: col 0 ↔ ilabel 1, col 1 ↔ ilabel 2
    ll = np.array([[0.0, -5.0], [-5.0, 0.0], [0.0, -5.0]], np.float32)
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        w["u1"] = ll
    assert main(["decode-faster", "--acoustic-scale=1.0",
                 str(tmp_path / "g.fst"), f"ark:{tmp_path}/ll.ark",
                 f"ark,t:{tmp_path}/w.txt",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    words = dict(SequentialTableReader(f"ark,t:{tmp_path}/w.txt",
                                       holder="text"))["u1"]
    assert words == ["7", "8", "7"]
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u1"]
    assert list(ali) == [1, 2, 1]


def test_latgen_parallel_matches_serial(tmp_path, rng):
    mdl, tm = _mdl(tmp_path, rng)
    # mini decoding graph over the model's tids
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.am.serialize import read_mdl
    lex = Lexicon(entries=[("A", ["Y"]), ("B", ["N"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm2 = TransitionModel(topo, tree)
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    P, M, D = tree.num_pdfs, 1, 2
    am = AmDiagGmm(np.ones((P, M)), rng.standard_normal((P, M, D)),
                   np.ones((P, M, D)))
    write_mdl(str(tmp_path / "g.mdl"), tm2, am)
    HCLG = mkgraph(lang, tm2, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words))
    from kaldi_tpu.fst.openfst_io import write_fst_path
    write_fst_path(str(tmp_path / "hclg.fst"), HCLG)
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        for i in range(4):
            w[f"u{i}"] = rng.standard_normal(
                (12, tm2.num_pdfs)).astype(np.float32)
    assert main(["latgen-faster-mapped", str(tmp_path / "g.mdl"),
                 str(tmp_path / "hclg.fst"), f"ark:{tmp_path}/ll.ark",
                 f"ark:{tmp_path}/lat_s.ark"]) == 0
    assert main(["latgen-faster-mapped-parallel", "--num-threads=3",
                 str(tmp_path / "g.mdl"), str(tmp_path / "hclg.fst"),
                 f"ark:{tmp_path}/ll.ark",
                 f"ark:{tmp_path}/lat_p.ark"]) == 0
    a = dict(SequentialTableReader(f"ark:{tmp_path}/lat_s.ark",
                                   holder="clat"))
    b = dict(SequentialTableReader(f"ark:{tmp_path}/lat_p.ark",
                                   holder="clat"))
    assert set(a) == set(b)
    for k in a:
        pa = {w: c for w, c in a[k].paths()}
        pb = {w: c for w, c in b[k].paths()}
        assert set(pa) == set(pb)
        for w in pa:
            assert pa[w] == pytest.approx(pb[w], abs=1e-4)


def test_pdf_to_counts(tmp_path):
    from kaldi_tpu.core import io as kio
    with TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as w:
        w["u1"] = [0, 0, 1, 3]
        w["u2"] = [1, 3, 3]
    assert main(["pdf-to-counts", f"ark:{tmp_path}/a.ark",
                 str(tmp_path / "counts.vec")]) == 0
    with kio.open_rxfilename(str(tmp_path / "counts.vec")) as f:
        kio.init_kaldi_input_stream(f)
        counts = np.asarray(kio.read_vector(f))
    np.testing.assert_allclose(counts, [2, 2, 0, 3])


def test_post_to_smat(tmp_path):
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="post") as w:
        w["u1"] = [[(0, 0.5), (2, 0.5)], [(1, 1.0)]]
    assert main(["post-to-smat", "--dim=4", f"ark:{tmp_path}/p.ark",
                 f"ark:{tmp_path}/m.ark"]) == 0
    m = dict(SequentialTableReader(f"ark:{tmp_path}/m.ark",
                                   holder="mat"))["u1"]
    np.testing.assert_allclose(
        m, [[0.5, 0, 0.5, 0], [0, 1.0, 0, 0]], atol=1e-6)


# ---------------------------------------------------------------------------
# lmbin + featbin stragglers
# ---------------------------------------------------------------------------

def test_const_arpa_roundtrip(tmp_path):
    from kaldi_tpu.fst import make_unigram_arpa
    from kaldi_tpu.fst.arpa import ArpaModel
    text = make_unigram_arpa({"A": 2.0, "B": 1.0, "C": 1.0})
    (tmp_path / "g.arpa").write_text(text)
    assert main(["arpa-to-const-arpa", str(tmp_path / "g.arpa"),
                 str(tmp_path / "g.const")]) == 0
    assert main(["const-arpa-to-arpa", str(tmp_path / "g.const"),
                 str(tmp_path / "g2.arpa")]) == 0
    a = ArpaModel.parse(str(tmp_path / "g.arpa"))
    b = ArpaModel.parse(str(tmp_path / "g2.arpa"))
    assert len(a.ngrams) == len(b.ngrams)
    for ta, tb in zip(a.ngrams, b.ngrams):
        assert set(ta) == set(tb)
        for ctx in ta:
            assert ta[ctx][0] == pytest.approx(tb[ctx][0], abs=1e-4)
            assert ta[ctx][1] == pytest.approx(tb[ctx][1], abs=1e-4)


def test_subset_feats(tmp_path, rng):
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(6):
            w[f"u{i}"] = rng.standard_normal((3, 2)).astype(np.float32)
    assert main(["subset-feats", "--n=2", f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/s.ark"]) == 0
    assert len(dict(SequentialTableReader(
        f"ark:{tmp_path}/s.ark", holder="mat"))) == 2
    (tmp_path / "keep").write_text("u3\nu5\n")
    assert main(["subset-feats", f"--include={tmp_path}/keep",
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/k.ark"]) == 0
    assert set(dict(SequentialTableReader(
        f"ark:{tmp_path}/k.ark", holder="mat"))) == {"u3", "u5"}
    (tmp_path / "drop").write_text("u0\n")
    assert main(["subset-feats", f"--exclude={tmp_path}/drop",
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/e.ark"]) == 0
    assert set(dict(SequentialTableReader(
        f"ark:{tmp_path}/e.ark", holder="mat"))) == {
            f"u{i}" for i in range(1, 6)}


def test_process_pitch_feats(tmp_path, rng):
    T = 50
    nccf = rng.uniform(-1, 1, T)
    f0 = rng.uniform(80, 300, T)
    with TableWriter(f"ark:{tmp_path}/p.ark", holder="mat") as w:
        w["u1"] = np.stack([nccf, f0], axis=1).astype(np.float32)
    assert main(["process-pitch-feats",
                 "--normalization-window-size=151",
                 f"ark:{tmp_path}/p.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u1"]
    assert out.shape == (T, 2)
    # window covers the whole utterance → exactly mean-subtracted
    assert abs(out[:, 1].mean()) < 1e-4
    # POV is a monotone map of |nccf| into [0, 1)
    assert (out[:, 0] >= 0).all() and (out[:, 0] < 1).all()
    order = np.argsort(np.abs(nccf))
    assert (np.diff(out[order, 0]) >= -1e-7).all()


def test_add_deltas_sdc(tmp_path, rng):
    T, D = 30, 4
    m = rng.standard_normal((T, D)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u1"] = m
    assert main(["add-deltas-sdc", "--delta-window=1", "--shift=3",
                 "--num-blocks=2", f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u1"]
    assert out.shape == (T, D * 3)
    np.testing.assert_allclose(out[:, :D], m, rtol=1e-6)
    # interior frame, block 0: c[t+1] − c[t−1]
    t = 10
    np.testing.assert_allclose(out[t, D:2 * D], m[t + 1] - m[t - 1],
                               rtol=1e-5)
    # block 1 (shift 3): c[t+4] − c[t+2]
    np.testing.assert_allclose(out[t, 2 * D:], m[t + 4] - m[t + 2],
                               rtol=1e-5)
