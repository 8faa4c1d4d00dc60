"""CLI bank 7: streaming nnet3 decoding, gmm-rescore-lattice,
select-voiced-frames."""

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import (SequentialTableReader, TableWriter)


def test_select_voiced_frames(tmp_path, rng):
    m = rng.standard_normal((10, 4)).astype(np.float32)
    vad = np.array([1, 1, 0, 0, 1, 0, 1, 1, 0, 1], np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark") as w:
        w["u"] = m
    with TableWriter(f"ark:{tmp_path}/v.ark", holder="vec") as w:
        w["u"] = vad
    assert TOOLS["select-voiced-frames"](
        [f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/v.ark",
         f"ark:{tmp_path}/o.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark"))["u"]
    np.testing.assert_allclose(got, m[vad > 0.5], atol=1e-6)


def test_gmm_rescore_lattice(tmp_path, rng):
    """Rescoring with the SAME model that decoded reproduces the
    decode-time acoustic costs (scaled)."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.fst import (ArpaModel, Lang, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.lang import Lexicon
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.lattice import determinize_lattice

    lex = Lexicon([("A", ["a"]), ("B", ["b"])])
    lang = Lang(lex)
    topo = HmmTopology.three_state(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(4), np.ones(4),
                              perturb=0.5, seed=0)
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=20.0, acoustic_scale=1.0,
                                          lattice_beam=8.0))
    feats = rng.standard_normal((24, 4)).astype(np.float32)
    ll = np.asarray(am.loglikes(feats))
    lat, _ = dec.decode_lattice(ll)
    clat = determinize_lattice(lat)
    with TableWriter(f"ark:{tmp_path}/lat.ark", holder="clat") as w:
        w["u"] = clat
    with TableWriter(f"ark:{tmp_path}/f.ark") as w:
        w["u"] = feats
    assert TOOLS["gmm-rescore-lattice"](
        [mdl, f"ark:{tmp_path}/lat.ark", f"ark:{tmp_path}/f.ark",
         f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="clat"))["u"]
    # same model → same best-path total cost (graph + acoustic)
    w0, _, c0 = clat.best_path()
    w1, _, c1 = out.best_path()
    assert w1 == w0
    assert c1 == pytest.approx(c0, abs=1e-2)


def test_online2_wav_nnet3_latgen(tmp_path, rng):
    """Streamed nnet3 decode runs end to end from wav + raw model +
    graph files and emits a transcript."""
    import jax
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.fst import (ArpaModel, Lang, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.lang import Lexicon

    lex = Lexicon([("A", ["a"]), ("B", ["b"])])
    lang = Lang(lex)
    topo = HmmTopology.chain(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(13), np.ones(13))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    cfg = TdnnConfig(feat_dim=13, num_pdfs=tree.num_pdfs, hidden_dim=16,
                     bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    net = TdnnChain(cfg)
    v = net.init(jax.random.PRNGKey(0),
                 np.zeros((1, 30, 13), np.float32), train=False)
    raw = str(tmp_path / "final.raw")
    write_raw_model(raw, v["params"], v["batch_stats"], cfg)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words),
        self_loop_scale=1.0)
    fst_txt = str(tmp_path / "HCLG.txt")
    HCLG.write_text(fst_txt)
    words_txt = str(tmp_path / "words.txt")
    lang.words.write(words_txt)
    wave = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["u"] = (wave, 16000)
    rc = TOOLS["online2-wav-nnet3-latgen-faster"](
        ["--chunk-length=0.2", f"--word-symbol-table={words_txt}",
         mdl, raw, fst_txt, f"ark:{tmp_path}/wav.ark",
         f"ark,t:{tmp_path}/tra.txt"])
    assert rc == 0
    out = open(f"{tmp_path}/tra.txt").read()
    assert out.startswith("u")

    # with online i-vectors: model input widens by the i-vector dim
    # (the OnlineIvectorFeature append contract)
    from kaldi_tpu.am.ivector import (IvectorExtractor,
                                      write_ivector_extractor)
    ivdim = 3
    ex = IvectorExtractor(np.zeros((2, 13)), np.ones((2, 13)),
                          np.full(2, 0.5), ivector_dim=ivdim, seed=0)
    ivex = str(tmp_path / "final.ie")
    write_ivector_extractor(ivex, ex)
    cfg_iv = TdnnConfig(feat_dim=13 + ivdim, num_pdfs=tree.num_pdfs,
                        hidden_dim=16, bottleneck_dim=4, num_layers=2,
                        frame_subsampling_factor=3)
    net_iv = TdnnChain(cfg_iv)
    v_iv = net_iv.init(jax.random.PRNGKey(0),
                       np.zeros((1, 30, 13 + ivdim), np.float32),
                       train=False)
    raw_iv = str(tmp_path / "final_iv.raw")
    write_raw_model(raw_iv, v_iv["params"], v_iv["batch_stats"], cfg_iv)
    rc = TOOLS["online2-wav-nnet3-latgen-faster"](
        ["--chunk-length=0.2", f"--ivector-extractor={ivex}",
         f"--word-symbol-table={words_txt}",
         mdl, raw_iv, fst_txt, f"ark:{tmp_path}/wav.ark",
         f"ark,t:{tmp_path}/tra_iv.txt"])
    assert rc == 0
    assert open(f"{tmp_path}/tra_iv.txt").read().startswith("u")
