"""CLI tool bank 2 (cli/tools_extra.py): fst / gmm / lm / lattice /
nnet3 / feature tools driven end-to-end through `main([...])` with real
files, oracled against the direct library calls.
"""

import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.am.gmm import AmDiagGmm, GmmAccs, accumulate_stats
from kaldi_tpu.am.serialize import read_mdl, write_mdl
from kaldi_tpu.cli import main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.fst.fst import Arc, SymbolTable, VectorFst
from kaldi_tpu.fst.openfst_io import read_fst_path
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


def _small_fst():
    f = VectorFst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, Arc(2, 5, 0.5, s1))
    f.add_arc(s0, Arc(1, 4, 0.3, s1))
    f.add_arc(s1, Arc(3, 6, 0.2, s2))
    f.set_final(s2, 0.1)
    return f


def _mono_model(tmp_path, rng, D=4, M=2):
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "0.mdl")
    write_mdl(path, tm, am)
    return path, tm, am


def test_fst_tools_roundtrip(tmp_path):
    f = _small_fst()
    txt = tmp_path / "a.txt"
    f.write_text(str(txt))
    binp = tmp_path / "a.fst"
    assert main(["fstcompile", str(txt), str(binp)]) == 0
    g = read_fst_path(str(binp))
    assert g.num_states == f.num_states
    # fstprint → identical arc content
    txt2 = tmp_path / "b.txt"
    assert main(["fstprint", str(binp), str(txt2)]) == 0
    h = VectorFst.read_text(str(txt2))
    assert sum(len(a) for a in h.arcs) == 3
    # arcsort by olabel reorders state 0
    sortp = tmp_path / "s.fst"
    assert main(["fstarcsort", "--sort_type=olabel", str(binp),
                 str(sortp)]) == 0
    s = read_fst_path(str(sortp))
    assert [a.olabel for a in s.arcs[0]] == [4, 5]


def test_fst_compose_determinize_minimize(tmp_path):
    from kaldi_tpu.fst.ops import (compose, determinize_star,
                                   minimize_encoded, rand_equivalent)
    a = _small_fst()
    b = VectorFst()
    t0, t1 = b.add_state(), b.add_state()
    b.set_start(t0)
    for lab in (4, 5, 6):
        b.add_arc(t0, Arc(lab, lab, 0.0, t1))
        b.add_arc(t1, Arc(lab, lab, 0.0, t1))
    b.set_final(t1, 0.0)
    pa, pb = tmp_path / "a.fst", tmp_path / "b.fst"
    a.write_text(str(pa))
    b.write_text(str(pb))
    out = tmp_path / "ab.fst"
    assert main(["fsttablecompose", str(pa), str(pb), str(out)]) == 0
    assert rand_equivalent(read_fst_path(str(out)), compose(a, b))
    det = tmp_path / "det.fst"
    assert main(["fstdeterminizestar", str(out), str(det)]) == 0
    assert rand_equivalent(read_fst_path(str(det)),
                           determinize_star(compose(a, b)))
    mn = tmp_path / "min.fst"
    assert main(["fstminimizeencoded", str(det), str(mn)]) == 0
    assert rand_equivalent(read_fst_path(str(mn)),
                           minimize_encoded(determinize_star(compose(a, b))))


def test_matrix_and_feat_tools(tmp_path, rng, capsys):
    mats = {f"u{i}": rng.standard_normal((3 + i, 5)).astype(np.float32)
            for i in range(3)}
    ark = tmp_path / "m.ark"
    with TableWriter(f"ark:{ark}", holder="mat") as w:
        for k, v in sorted(mats.items()):
            w[k] = v
    out = tmp_path / "c.ark"
    assert main(["copy-matrix", "--scale=2.0", f"ark:{ark}",
                 f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="mat"))
    np.testing.assert_allclose(np.asarray(got["u1"]), mats["u1"] * 2,
                               rtol=1e-6)
    assert main(["feat-to-dim", f"ark:{ark}"]) == 0
    assert capsys.readouterr().out.strip() == "5"
    assert main(["feat-to-len", f"ark:{ark}"]) == 0
    lens = dict(line.split() for line in
                capsys.readouterr().out.strip().splitlines())
    assert lens["u2"] == "5"
    # sum-matrices needs same-shaped inputs
    sq = {k: rng.standard_normal((4, 5)).astype(np.float32)
          for k in ("a", "b", "c")}
    ark2 = tmp_path / "sq.ark"
    with TableWriter(f"ark:{ark2}", holder="mat") as w:
        for k, v in sorted(sq.items()):
            w[k] = v
    sm = tmp_path / "sum.mat"
    assert main(["sum-matrices", f"ark:{ark2}", str(sm)]) == 0
    from kaldi_tpu.core.io import read_matrix
    with open(sm, "rb") as f:
        assert f.read(2) == b"\0B"
        total = read_matrix(f)
    np.testing.assert_allclose(total, sum(sq.values()), atol=1e-5)


def test_apply_cmvn_sliding(tmp_path, rng):
    from kaldi_tpu.features.functions import (SlidingWindowCmnOptions,
                                              sliding_window_cmn)
    x = rng.standard_normal((40, 6)).astype(np.float32)
    ark = tmp_path / "f.ark"
    with TableWriter(f"ark:{ark}", holder="mat") as w:
        w["u0"] = x
    out = tmp_path / "o.ark"
    assert main(["apply-cmvn-sliding", "--cmn-window=10",
                 "--min-cmn-window=5", f"ark:{ark}", f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="mat"))["u0"]
    ref = sliding_window_cmn(x, SlidingWindowCmnOptions(
        cmn_window=10, min_window=5))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_gmm_acc_sum_est(tmp_path, rng):
    mdl, tm, am = _mono_model(tmp_path, rng)
    D = am.dim
    T = 30
    feats = {u: rng.standard_normal((T, D)).astype(np.float32)
             for u in ("u0", "u1")}
    alis = {u: rng.integers(1, tm.num_transition_ids + 1,
                            size=T).astype(np.int32)
            for u in feats}
    fark, aark = tmp_path / "f.ark", tmp_path / "a.ark"
    with TableWriter(f"ark:{fark}", holder="mat") as w:
        for k, v in sorted(feats.items()):
            w[k] = v
    with TableWriter(f"ark:{aark}", holder="ivec") as w:
        for k, v in sorted(alis.items()):
            w[k] = v
    acc1, acc2 = tmp_path / "1.acc", tmp_path / "2.acc"
    # two jobs: one utterance each (rspecifier offset via subsetting)
    with TableWriter(f"ark:{tmp_path}/f0.ark", holder="mat") as w:
        w["u0"] = feats["u0"]
    with TableWriter(f"ark:{tmp_path}/f1.ark", holder="mat") as w:
        w["u1"] = feats["u1"]
    assert main(["gmm-acc-stats-ali", mdl, f"ark:{tmp_path}/f0.ark",
                 f"ark:{aark}", str(acc1)]) == 0
    assert main(["gmm-acc-stats-ali", mdl, f"ark:{tmp_path}/f1.ark",
                 f"ark:{aark}", str(acc2)]) == 0
    summed = tmp_path / "sum.acc"
    assert main(["gmm-sum-accs", str(summed), str(acc1), str(acc2)]) == 0
    # oracle: accumulate both in one pass
    ref = GmmAccs.zeros(am.num_pdfs, am.max_mix, am.dim)
    for u in ("u0", "u1"):
        accumulate_stats(am, feats[u], tm.tid_to_pdf_array[alis[u]], ref)
    from kaldi_tpu.cli.tools_extra import read_gmm_accs
    got = read_gmm_accs(str(summed))
    np.testing.assert_allclose(got.occ, ref.occ, rtol=1e-5)
    np.testing.assert_allclose(got.mean_acc, ref.mean_acc, rtol=1e-4)
    assert got.tot_frames == ref.tot_frames
    # gmm-est produces a loadable, changed model
    out_mdl = tmp_path / "1.mdl"
    assert main(["gmm-est", mdl, str(summed), str(out_mdl)]) == 0
    _, am2 = read_mdl(str(out_mdl))
    assert not np.allclose(am2.means, am.means)
    # gmm-copy and gmm-mixup round-trip
    cp = tmp_path / "cp.mdl"
    assert main(["gmm-copy", str(out_mdl), str(cp)]) == 0
    mx = tmp_path / "mx.mdl"
    assert main(["gmm-mixup", "--mix-up=%d" % (am.num_gauss() + 2),
                 str(out_mdl), str(mx)]) == 0
    _, am3 = read_mdl(str(mx))
    assert am3.num_gauss() >= am2.num_gauss()


def test_arpa2fst(tmp_path):
    from kaldi_tpu.fst.arpa import make_unigram_arpa
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(make_unigram_arpa({"yes": 0.6, "no": 0.4}))
    st = SymbolTable()
    for w in ("<eps>", "yes", "no", "#0", "<s>", "</s>"):
        st.add(w)
    wtxt = tmp_path / "words.txt"
    st.write(str(wtxt))
    out = tmp_path / "G.fst"
    assert main(["arpa2fst", f"--read-symbol-table={wtxt}",
                 str(arpa), str(out)]) == 0
    G = read_fst_path(str(out))
    assert G.num_states > 0 and sum(len(a) for a in G.arcs) > 0


def _tiny_clat():
    c = CompactLattice()
    s0, s1, s2 = c.add_state(), c.add_state(), c.add_state()
    c.start = s0
    c.arcs[s0].append(CompactArc(7, 1.0, 2.0, (3, 4), s1))
    c.arcs[s0].append(CompactArc(8, 1.5, 2.5, (5, 6), s1))
    c.arcs[s1].append(CompactArc(9, 0.5, 0.5, (3,), s2))
    c.finals[s2] = (0.0, 0.0, ())
    return c


def test_lattice_copy_and_depth(tmp_path, capsys):
    ark = tmp_path / "lat.ark"
    with TableWriter(f"ark:{ark}", holder="clat") as w:
        w["u0"] = _tiny_clat()
    out = tmp_path / "cp.ark"
    assert main(["lattice-copy", f"ark:{ark}", f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="clat"))["u0"]
    assert got.num_states == 3 and got.num_arcs == 3
    assert main(["lattice-depth", f"ark:{ark}"]) == 0
    dep = capsys.readouterr().out.strip().split()
    # 2+2+1 arc frames over 3 frames ≈ 1.67
    assert dep[0] == "u0" and abs(float(dep[1]) - 5 / 3) < 0.01


def test_wav_ivec_spectrogram_tools(tmp_path, rng, capsys):
    wave = (rng.standard_normal(16000) * 1000).astype(np.float32)
    wark = tmp_path / "w.ark"
    with TableWriter(f"ark:{wark}", holder="wav") as w:
        w["u0"] = (wave, 16000)
    assert main(["wav-to-duration", f"ark:{wark}"]) == 0
    k, d = capsys.readouterr().out.split()
    assert k == "u0" and abs(float(d) - 1.0) < 1e-3
    out = tmp_path / "spec.ark"
    assert main(["compute-spectrogram-feats", "--dither=0",
                 f"ark:{wark}", f"ark:{out}"]) == 0
    spec = dict(SequentialTableReader(f"ark:{out}", holder="mat"))["u0"]
    assert np.asarray(spec).shape[0] == 98      # 1 s, 25ms/10ms frames
    iark, iout = tmp_path / "i.ark", tmp_path / "io.ark"
    with TableWriter(f"ark:{iark}", holder="ivec") as w:
        w["u0"] = np.array([3, 1, 4, 1, 5], np.int32)
    assert main(["copy-int-vector", f"ark:{iark}", f"ark:{iout}"]) == 0
    got = dict(SequentialTableReader(f"ark:{iout}", holder="ivec"))["u0"]
    np.testing.assert_array_equal(got, [3, 1, 4, 1, 5])


def test_online2_wav_gmm_latgen(tmp_path, rng):
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.features import (DeltaFeaturesOptions,
                                    FrameExtractionOptions, Mfcc,
                                    MfccOptions, add_deltas)
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words))
    P, M, D = tree.num_pdfs, 2, 39
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    mdl = tmp_path / "final.mdl"
    write_mdl(str(mdl), tm, am)
    fstp = tmp_path / "HCLG.fst"
    HCLG.write_text(str(fstp))
    wave = (rng.standard_normal(12000) * 500).astype(np.float32)
    wark = tmp_path / "w.ark"
    with TableWriter(f"ark:{wark}", holder="wav") as w:
        w["u0"] = (wave, 16000)
    out = tmp_path / "words.ark"
    assert main(["online2-wav-gmm-latgen-faster", str(mdl), str(fstp),
                 f"ark:{wark}", f"ark:{out}"]) == 0
    got = dict(SequentialTableReader(f"ark:{out}", holder="text"))["u0"]
    # oracle: offline features + batch decode must give the same words
    mfcc = Mfcc(MfccOptions(frame_opts=FrameExtractionOptions(dither=0.0)))
    feats = np.asarray(add_deltas(mfcc.compute(wave),
                                  DeltaFeaturesOptions()))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=16.0, acoustic_scale=0.1))
    _, ref_ols, _ = dec.decode(np.asarray(am.loglikes(feats)))
    assert got == [str(o) for o in ref_ols]


def test_nnet3_info_copy(tmp_path, capsys):
    from kaldi_tpu.am.nnet3_io import (Nnet3Model, _affine, write_nnet3)
    rng = np.random.default_rng(0)
    model = Nnet3Model(
        config_lines=["component name=aff type=NGAC"],
        components=[_affine("tdnn1.affine",
                            rng.standard_normal((8, 4)).astype(np.float32),
                            rng.standard_normal(8).astype(np.float32))])
    p = tmp_path / "final.raw"
    with open(p, "wb") as f:
        f.write(b"\0B")
        write_nnet3(f, model)
    assert main(["nnet3-info", str(p)]) == 0
    out = capsys.readouterr().out
    assert "num-components 1" in out and "tdnn1.affine" in out
    cp = tmp_path / "cp.raw"
    assert main(["nnet3-copy", str(p), str(cp)]) == 0
    assert main(["nnet3-info", str(cp)]) == 0
    assert "tdnn1.affine" in capsys.readouterr().out


def test_latgen_decoder_large_graph_path(tmp_path, rng):
    """_LatgenDecoder's BeamDecoder branch (forced via dense_limit=0)
    must produce the same best path as the DenseDecoder branch."""
    from kaldi_tpu.cli.tools import _LatgenDecoder
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words))
    dense = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, 16.0, 8.0, 1.0)
    beam = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, 16.0, 8.0, 1.0,
                          max_active=512, dense_limit=0)
    assert dense._compact is False and beam._compact is True
    for _ in range(3):
        ll = rng.standard_normal((15, tm.num_pdfs)).astype(np.float32)
        dw, dt, dc = dense.decode_to_clat(ll).best_path()
        bw, bt, bc = beam.decode_to_clat(ll).best_path()
        assert dw == bw and abs(dc - bc) < 1e-2
