"""CLI bank 16: nnet3 discriminative egs plumbing + sequence training,
model combination, chain egs tail, x-vector binaries, mapped decode."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice


@pytest.fixture
def rng():
    return np.random.default_rng(16)


def _mono_model(tmp_path, rng, D=4, M=2, phones=(1, 2)):
    topo = HmmTopology.three_state(list(phones))
    tree = MonophoneContextDependency(list(phones), topo)
    tm = TransitionModel(topo, tree)
    P = tree.num_pdfs
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   2.0 * rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    path = str(tmp_path / "0.mdl")
    write_mdl(path, tm, am)
    return path, tm, am


def _phone_tids(tm, phone, frames):
    first = next(t for t in range(1, tm.num_transition_ids + 1)
                 if tm.transition_id_to_phone(t) == phone
                 and tm.transition_id_to_hmm_state(t) == 0
                 and not tm.is_self_loop(t))
    loop = next(t for t in range(1, tm.num_transition_ids + 1)
                if tm.transition_id_to_phone(t) == phone
                and tm.transition_id_to_hmm_state(t) == 0
                and tm.is_self_loop(t))
    return [first] + [loop] * (frames - 1)


@pytest.fixture
def disc_setup(tmp_path, rng):
    """Model + feats + pdf ali + 2-path denominator lattices on disk."""
    mdl, tm, am = _mono_model(tmp_path, rng)
    T = 6
    tids_a = _phone_tids(tm, 1, T)
    tids_b = _phone_tids(tm, 2, T)
    feats, alis = {}, {}
    with TableWriter(f"ark:{tmp_path}/lats.ark", holder="clat") as lw:
        for k in ("u1", "u2"):
            clat = CompactLattice()
            s0, s1 = clat.add_state(), clat.add_state()
            clat.start = s0
            clat.arcs[s0].append(CompactArc(1, 0.5, 0.0,
                                            tuple(tids_a), s1))
            clat.arcs[s0].append(CompactArc(2, 0.7, 0.0,
                                            tuple(tids_b), s1))
            clat.finals[s1] = (0.0, 0.0, ())
            lw[k] = clat
            feats[k] = rng.standard_normal((T, am.dim)).astype(
                np.float32)
            alis[k] = np.asarray(
                [tm.transition_id_to_pdf(t) for t in tids_a], np.int32)
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        for k, v in alis.items():
            w[k] = v
    assert TOOLS["nnet3-init"](
        [f"--feat-dim={am.dim}", f"--num-pdfs={tm.num_pdfs}",
         "--hidden-dim=16", "--bottleneck-dim=8", "--num-layers=2",
         str(tmp_path / "0.raw")]) == 0
    return {"mdl": mdl, "tm": tm, "D": am.dim, "tmp": tmp_path, "T": T}


def test_discriminative_egs_pipeline(disc_setup):
    t = disc_setup["tmp"]
    assert TOOLS["nnet3-discriminative-get-egs"](
        [disc_setup["mdl"], f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         f"ark:{t}/lats.ark", f"ark:{t}/degs.ark"]) == 0
    degs = dict(SequentialTableReader(f"ark:{t}/degs.ark",
                                      holder="deg"))
    assert sorted(degs) == ["u1", "u2"]
    eg = degs["u1"]
    assert eg.feats.shape == (disc_setup["T"], disc_setup["D"])
    assert eg.src.shape == eg.pdf.shape
    assert eg.mask.sum() >= 2 * disc_setup["T"]   # two parallel paths

    assert TOOLS["nnet3-discriminative-copy-egs"](
        ["--n=1", f"ark:{t}/degs.ark", f"ark:{t}/sub.ark"]) == 0
    assert len(dict(SequentialTableReader(f"ark:{t}/sub.ark",
                                          holder="deg"))) == 1
    assert TOOLS["nnet3-discriminative-shuffle-egs"](
        ["--srand=3", f"ark:{t}/degs.ark", f"ark:{t}/shuf.ark"]) == 0
    assert len(dict(SequentialTableReader(f"ark:{t}/shuf.ark",
                                          holder="deg"))) == 2


def test_discriminative_train_improves_objf(disc_setup, capsys):
    t = disc_setup["tmp"]
    assert TOOLS["nnet3-discriminative-get-egs"](
        [disc_setup["mdl"], f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         f"ark:{t}/lats.ark", f"ark:{t}/degs.ark"]) == 0

    def objf(raw):
        assert TOOLS["nnet3-discriminative-compute-objf"](
            ["--criterion=mmi", raw, f"ark:{t}/degs.ark"]) == 0
        out = capsys.readouterr().out
        return float(out.strip().splitlines()[-1].split()[1])

    before = objf(str(t / "0.raw"))
    assert TOOLS["nnet3-discriminative-train"](
        ["--criterion=mmi", "--num-epochs=12",
         "--learning-rate=0.003", str(t / "0.raw"),
         f"ark:{t}/degs.ark", str(t / "1.raw")]) == 0
    after = objf(str(t / "1.raw"))
    assert after > before


def test_nnet3_combine_and_show_progress(disc_setup, capsys):
    t = disc_setup["tmp"]
    assert TOOLS["nnet3-init"](
        [f"--feat-dim={disc_setup['D']}",
         f"--num-pdfs={disc_setup['tm'].num_pdfs}",
         "--hidden-dim=16", "--bottleneck-dim=8", "--num-layers=2",
         "--srand=5", str(t / "b.raw")]) == 0
    assert TOOLS["nnet3-combine"](
        ["--num-iters=10", f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         str(t / "0.raw"), str(t / "b.raw"),
         str(t / "comb.raw")]) == 0
    assert (t / "comb.raw").exists()
    assert TOOLS["nnet3-show-progress"](
        [str(t / "0.raw"), str(t / "comb.raw")]) == 0
    out = capsys.readouterr().out
    assert "rel-param-change" in out
    # combined differs from model 0 (weights averaged with b)
    assert any(float(line.split()[-1]) > 0
               for line in out.strip().splitlines())


def test_subset_egs_tools(disc_setup, rng):
    t = disc_setup["tmp"]
    assert TOOLS["nnet3-get-egs"](
        ["--chunk-size=3", f"ark:{t}/feats.ark", f"ark:{t}/ali.ark",
         f"ark:{t}/xegs.ark"]) == 0
    assert TOOLS["nnet3-subset-egs"](
        ["--n=2", f"ark:{t}/xegs.ark", f"ark:{t}/xsub.ark"]) == 0
    assert len(dict(SequentialTableReader(f"ark:{t}/xsub.ark",
                                          holder="xeg"))) == 2
    assert TOOLS["nnet3-acc-lda-stats"](
        [f"ark:{t}/xegs.ark", str(t / "lda.acc")]) == 0
    assert TOOLS["est-lda"](
        [f"--dim={disc_setup['D'] - 1}", str(t / "lda.mat"),
         str(t / "lda.acc")]) == 0


def test_chain_make_den_fst_and_subset(disc_setup):
    t = disc_setup["tmp"]
    from kaldi_tpu.am.chain import read_denominator_graph
    from kaldi_tpu.core import io as kio
    with TableWriter(f"ark:{t}/phones.ark", holder="ivec") as w:
        w["u1"] = np.asarray([1, 2, 1], np.int32)
        w["u2"] = np.asarray([2, 1], np.int32)
    assert TOOLS["nnet3-chain-make-den-fst"](
        ["--lm-order=2", disc_setup["mdl"], f"ark:{t}/phones.ark",
         str(t / "den.graph")]) == 0
    with kio.open_rxfilename(str(t / "den.graph")) as f:
        kio.init_kaldi_input_stream(f)
        den = read_denominator_graph(f)
    assert den.num_states > 0 and len(den.src) > 0
    assert np.isclose(np.exp(den.initial).sum(), 1.0, atol=1e-3)


def test_xvector_tools(tmp_path, rng):
    from kaldi_tpu.am.xvector import (XvectorConfig, save_xvector_model,
                                      train_xvector)
    D = 5
    feats, u2s = {}, {}
    mu = {"spkA": rng.normal(size=D), "spkB": rng.normal(size=D)}
    for i in range(6):
        spk = "spkA" if i % 2 == 0 else "spkB"
        u = f"utt{i}"
        feats[u] = (mu[spk]
                    + 0.3 * rng.normal(size=(40, D))).astype(np.float32)
        u2s[u] = spk
    with TableWriter(f"ark:{tmp_path}/feats.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    with TableWriter(f"ark:{tmp_path}/utt2spk.ark", holder="text") as w:
        for k, v in u2s.items():
            w[k] = [v]

    assert TOOLS["nnet3-xvector-get-egs"](
        ["--chunk-size=20", f"--spk-list={tmp_path}/spks.txt",
         f"ark:{tmp_path}/feats.ark", f"ark:{tmp_path}/utt2spk.ark",
         f"ark:{tmp_path}/xv.egs"]) == 0
    egs = dict(SequentialTableReader(f"ark:{tmp_path}/xv.egs",
                                     holder="xeg"))
    assert len(egs) == 12             # 6 utts × 2 chunks
    spks = open(f"{tmp_path}/spks.txt").read().split()
    assert spks == ["spkA", "spkB"]

    cfg = XvectorConfig(feat_dim=D, hidden_dim=16, embed_dim=8,
                        contexts=((-1, 0, 1), (0,)))
    variables, model, spk_list = train_xvector(
        feats, u2s, cfg, num_epochs=2, batch_size=4, chunk=20)
    save_xvector_model(str(tmp_path / "xvec.raw"), variables,
                       model.config, spk_list)
    assert TOOLS["nnet3-xvector-compute"](
        [str(tmp_path / "xvec.raw"), f"ark:{tmp_path}/feats.ark",
         f"ark:{tmp_path}/emb.ark"]) == 0
    embs = dict(SequentialTableReader(f"ark:{tmp_path}/emb.ark",
                                      holder="vec"))
    assert len(embs) == 6 and embs["utt0"].shape == (8,)


@pytest.fixture
def mapped_setup(tmp_path, rng):
    """Model + tiny HCLG + loglike matrices for the mapped tools."""
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3),
                              perturb=0.1)
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    fst_path = tmp_path / "HCLG.txt"
    HCLG.write_text(str(fst_path))
    # loglikes peaked on GO's pdf sequence
    T = 14
    lls = {}
    rngl = np.random.default_rng(5)
    ll = np.full((T, tm.num_pdfs), -8.0, np.float32)
    go_phones = [lang.phones["G"], lang.phones["OW"]]
    pdf_seq = []
    for p in go_phones:
        for st in range(3):
            pdf_seq.extend([tree.compute([p], st)] * 2)
    for tfr, pdf in enumerate(pdf_seq[:T]):
        ll[tfr, pdf] = 0.0
    lls["u1"] = ll + 0.01 * rngl.standard_normal(ll.shape).astype(
        np.float32)
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        for k, v in lls.items():
            w[k] = v
    return {"mdl": mdl, "fst": str(fst_path), "tmp": tmp_path,
            "lang": lang, "tm": tm, "T": T}


def test_latgen_faster_mapped(mapped_setup):
    t = mapped_setup["tmp"]
    assert TOOLS["latgen-faster-mapped"](
        ["--acoustic-scale=1.0", mapped_setup["mdl"],
         mapped_setup["fst"], f"ark:{t}/ll.ark", f"ark:{t}/lat.ark",
         f"ark,t:{t}/w.txt"]) == 0
    lats = dict(SequentialTableReader(f"ark:{t}/lat.ark",
                                      holder="clat"))
    words = lats["u1"].best_path()[0]
    assert [mapped_setup["lang"].words.find(w) for w in words] == ["GO"]


def test_decode_faster_mapped(mapped_setup):
    t = mapped_setup["tmp"]
    assert TOOLS["decode-faster-mapped"](
        ["--acoustic-scale=1.0", mapped_setup["mdl"],
         mapped_setup["fst"], f"ark:{t}/ll.ark", f"ark,t:{t}/w.txt",
         f"ark:{t}/ali.ark"]) == 0
    hyp = dict(SequentialTableReader(f"ark,t:{t}/w.txt",
                                     holder="text"))["u1"]
    go_id = mapped_setup["lang"].words["GO"]
    assert hyp == [str(go_id)]
    ali = dict(SequentialTableReader(f"ark:{t}/ali.ark",
                                     holder="ivec"))["u1"]
    assert len(ali) == mapped_setup["T"]


def test_align_mapped(mapped_setup, tmp_path):
    t = mapped_setup["tmp"]
    lexp = tmp_path / "lex.txt"
    lexp.write_text("GO G OW\nNO N OW\n")
    with TableWriter(f"ark:{t}/text.ark", holder="text") as w:
        w["u1"] = ["GO"]
    assert TOOLS["compile-train-graphs"](
        [str(lexp), mapped_setup["mdl"], f"ark:{t}/text.ark",
         f"ark:{t}/graphs.ark"]) == 0
    assert TOOLS["align-mapped"](
        ["--acoustic-scale=1.0", mapped_setup["mdl"],
         f"ark:{t}/graphs.ark", f"ark:{t}/ll.ark",
         f"ark:{t}/ali.ark"]) == 0
    ali = dict(SequentialTableReader(f"ark:{t}/ali.ark",
                                     holder="ivec"))["u1"]
    assert len(ali) == mapped_setup["T"]
    tmm = mapped_setup["tm"]
    ph = [tmm.transition_id_to_phone(int(x)) for x in ali]
    dedup = [p for i, p in enumerate(ph) if i == 0 or p != ph[i - 1]]
    lang = mapped_setup["lang"]
    nonsil = [p for p in dedup if p != lang.phones["SIL"]]
    assert nonsil == [lang.phones["G"], lang.phones["OW"]]
