"""CLI bank 23: nnet3/chainbin egs + model-utility tails.

Oracles: make_chain_egs's own normalization weights (whole-utterance
chunks → empty history → normalize-egs must reproduce them exactly),
direct chain_objf evaluation for combine, manual log-prior
subtraction for compute-batch, serial-vs-parallel latgen equality.
"""

import io as pio

import jax
import numpy as np
import pytest

from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                          TransitionModel)
from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(23)


@pytest.fixture
def chain_setup(tmp_path, rng):
    """Chain model + feats/phone-run alignments + den graph + egs with
    normalization weights (one chunk per utterance)."""
    from kaldi_tpu.am.chain import (make_denominator_graph,
                                    write_denominator_graph)
    from kaldi_tpu.core import io as kio
    from kaldi_tpu.pipelines.chain import make_chain_egs
    from kaldi_tpu.pipelines.egs_io import egs_to_list
    phones = [1, 2, 3]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 5
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "0.mdl")
    write_mdl(mdl, tm, am)
    T = 24
    feats, runs, seqs = {}, {}, []
    for i in range(4):
        seq = [int(p) for p in rng.choice(phones, size=4)]
        seqs.append(seq)
        runs[f"u{i}"] = [(p, T // len(seq)) for p in seq]
        feats[f"u{i}"] = rng.standard_normal((T, D)).astype(np.float32)
    den = make_denominator_graph(seqs, tree, topo, order=2)
    den_path = str(tmp_path / "den.fst")
    with kio.open_wxfilename(den_path) as f:
        kio.init_kaldi_output_stream(f)
        write_denominator_graph(f, den)
    egs = make_chain_egs(feats, runs, tree, topo, chunk_size=T,
                         subsample=3, den=den)
    entries = egs_to_list(egs)
    with TableWriter(f"ark:{tmp_path}/egs.ark", holder="ceg") as w:
        for i, eg in enumerate(entries):
            w[f"eg{i}"] = eg
    return dict(tmp=tmp_path, mdl=mdl, tm=tm, den=den,
                den_path=den_path, D=D, T=T, entries=entries,
                feats=feats, phones=phones)


def test_chain_merge_egs(chain_setup, tmp_path):
    t = chain_setup["tmp"]
    assert main(["nnet3-chain-merge-egs", "--minibatch-size=2",
                 f"ark:{t}/egs.ark", f"ark:{t}/merged.ark"]) == 0
    got = list(SequentialTableReader(f"ark:{t}/merged.ark",
                                     holder="ceg"))
    assert len(got) == len(chain_setup["entries"])
    # keys carry minibatch grouping; same-shape pairs share a prefix
    assert got[0][0].startswith("mb0-") and got[1][0].startswith("mb0-")
    assert got[2][0].startswith("mb1-")
    assert main(["nnet3-chain-merge-egs", "--minibatch-size=3",
                 "--discard-partial=true", f"ark:{t}/egs.ark",
                 f"ark:{t}/m2.ark"]) == 0
    got2 = list(SequentialTableReader(f"ark:{t}/m2.ark", holder="ceg"))
    assert len(got2) == 3         # 4 same-shape egs → one full mb of 3


def test_chain_normalize_egs_reproduces_weights(chain_setup):
    """Strip the weights, re-normalize through the CLI, compare to the
    weights make_chain_egs computed — exact for whole-utterance chunks
    (empty cross-chunk history)."""
    t = chain_setup["tmp"]
    stripped = f"ark:{t}/egs_nw.ark"
    truth = {}
    with TableWriter(stripped, holder="ceg") as w:
        for i, eg in enumerate(chain_setup["entries"]):
            truth[f"eg{i}"] = (np.array(eg.entry_w), np.array(eg.self_w),
                               eg.init_w, eg.final_w)
            eg.entry_w = np.zeros_like(eg.entry_w)
            eg.self_w = np.zeros_like(eg.self_w)
            eg.init_w = 0.0
            eg.final_w = 0.0
            w[f"eg{i}"] = eg
    assert main(["nnet3-chain-normalize-egs", chain_setup["mdl"],
                 chain_setup["den_path"], stripped,
                 f"ark:{t}/egs_norm.ark"]) == 0
    for key, eg in SequentialTableReader(f"ark:{t}/egs_norm.ark",
                                         holder="ceg"):
        ew, sw, iw, fw = truth[key]
        np.testing.assert_allclose(eg.entry_w, ew, atol=1e-4)
        np.testing.assert_allclose(eg.self_w, sw, atol=1e-4)
        assert eg.init_w == pytest.approx(iw, abs=1e-4)
        assert eg.final_w == pytest.approx(fw, abs=1e-4)


def _raw_model(tmp_path, rng, D, P, name, seed=0, sub=3):
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    cfg = TdnnConfig(feat_dim=D, num_pdfs=P, hidden_dim=16,
                     bottleneck_dim=8, num_layers=2,
                     frame_subsampling_factor=sub)
    net = TdnnChain(cfg)
    variables = net.init(jax.random.PRNGKey(seed),
                         np.zeros((2, 12, D)), train=False)
    path = str(tmp_path / name)
    write_raw_model(path, variables["params"],
                    variables.get("batch_stats", {}), cfg)
    return path, cfg


def test_chain_combine(chain_setup, rng, capsys):
    t = chain_setup["tmp"]
    P = chain_setup["tm"].num_pdfs
    r1, _ = _raw_model(t, rng, chain_setup["D"], P, "a.raw", seed=1)
    r2, _ = _raw_model(t, rng, chain_setup["D"], P, "b.raw", seed=2)
    assert main(["nnet3-chain-combine", "--num-iters=10",
                 chain_setup["den_path"], f"ark:{t}/egs.ark",
                 r1, r2, str(t / "comb.raw")]) == 0
    # combined model is loadable and its objf is >= the worse input's
    from kaldi_tpu.cli.tools_bank16 import _read_raw_auto
    import jax.numpy as jnp
    from kaldi_tpu.am.chain import ChainTrainingOptions, chain_objf
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.pipelines.egs_io import read_egs_ark
    egs = read_egs_ark(f"ark:{t}/egs.ark")

    def objf(path):
        params, bs, cfg = _read_raw_auto(path)
        cfg.frame_subsampling_factor = 3
        net = TdnnChain(cfg)
        scores = net.apply({"params": params, "batch_stats": bs},
                           jnp.asarray(egs.feats), train=False)
        loss, _diag = chain_objf(chain_setup["den"], scores,
                                 jnp.asarray(egs.pdf_ali),
                                 jnp.asarray(egs.mask),
                                 ChainTrainingOptions())
        return -float(loss)

    assert objf(str(t / "comb.raw")) >= min(objf(r1), objf(r2)) - 1e-4


def test_chain_compute_post_and_acc_lda(chain_setup, rng):
    t = chain_setup["tmp"]
    P = chain_setup["tm"].num_pdfs
    raw, _ = _raw_model(t, rng, chain_setup["D"], P, "p.raw")
    with TableWriter(f"ark:{t}/f.ark", holder="mat") as w:
        for k, v in chain_setup["feats"].items():
            w[k] = v
    assert main(["nnet3-chain-compute-post", raw, f"ark:{t}/f.ark",
                 f"ark:{t}/post.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{t}/post.ark",
                                      holder="mat"))
    for k, m in post.items():
        assert m.shape[1] == P
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-4)
    assert main(["nnet3-chain-acc-lda-stats", chain_setup["mdl"],
                 f"ark:{t}/egs.ark", str(t / "lda.accs")]) == 0
    # est-lda consumes the accs (acc-lda wire format)
    assert main(["est-lda", "--dim=3", str(t / "lda.mat"),
                 str(t / "lda.accs")]) == 0


def test_am_init_priors_transitions_compute_batch(tmp_path, rng):
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D, P = 4, tree.num_pdfs
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D))
    gmm_mdl = str(tmp_path / "g.mdl")
    write_mdl(gmm_mdl, tm, am)
    raw, cfg = _raw_model(tmp_path, rng, D, P, "m.raw", sub=1)
    assert main(["nnet3-am-init", gmm_mdl, raw,
                 str(tmp_path / "am.mdl")]) == 0
    # priors from counts
    with TableWriter(f"ark:{tmp_path}/pa.ark", holder="ivec") as w:
        w["u1"] = [0, 0, 1, 2, 3, 3, 3]
    assert main(["pdf-to-counts", f"ark:{tmp_path}/pa.ark",
                 str(tmp_path / "counts")]) == 0
    assert main(["nnet3-am-adjust-priors", str(tmp_path / "am.mdl"),
                 str(tmp_path / "counts"),
                 str(tmp_path / "amp.mdl")]) == 0
    # compute-batch subtracts log-priors iff present
    feats = {f"u{i}": rng.standard_normal((9, D)).astype(np.float32)
             for i in range(3)}
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for k, v in feats.items():
            w[k] = v
    for model, out in ((raw, "o_raw.ark"), (str(tmp_path / "amp.mdl"),
                                            "o_pri.ark")):
        assert main(["nnet3-compute-batch",
                     "--frame-subsampling-factor=1", model,
                     f"ark:{tmp_path}/f.ark",
                     f"ark:{tmp_path}/{out}"]) == 0
    a = dict(SequentialTableReader(f"ark:{tmp_path}/o_raw.ark",
                                   holder="mat"))
    b = dict(SequentialTableReader(f"ark:{tmp_path}/o_pri.ark",
                                   holder="mat"))
    from kaldi_tpu.cli.tools_bank23 import _split_mdl
    _tb, _nb, priors = _split_mdl(str(tmp_path / "amp.mdl"))
    assert priors is not None and priors.shape == (P,)
    lp = np.log(priors)
    for k in feats:
        np.testing.assert_allclose(b[k], a[k] - lp[None, :], atol=1e-4)
    # train-transitions changes the tm but keeps the nnet + priors
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u1"] = [1, 2, 2, 2, 1]
    assert main(["nnet3-am-train-transitions",
                 str(tmp_path / "amp.mdl"), f"ark:{tmp_path}/ali.ark",
                 str(tmp_path / "amt.mdl")]) == 0
    _tb2, nb2, priors2 = _split_mdl(str(tmp_path / "amt.mdl"))
    np.testing.assert_allclose(priors2, priors)
    assert nb2.strip() == _nb.strip()


def test_nnet3_latgen_parallel_matches_serial(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.openfst_io import write_fst_path
    lex = Lexicon(entries=[("A", ["Y"]), ("B", ["N"])])
    lang = Lang(lex)
    topo = HmmTopology.chain(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    D, P = 4, tree.num_pdfs
    am = AmDiagGmm.flat_start(P, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "c.mdl")
    write_mdl(mdl, tm, am)
    raw, _cfg = _raw_model(tmp_path, rng, D, P, "c.raw", sub=3)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words),
        self_loop_scale=1.0)
    write_fst_path(str(tmp_path / "hclg.fst"), HCLG)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for i in range(3):
            w[f"u{i}"] = rng.standard_normal((24, D)).astype(np.float32)
    assert main(["nnet3-latgen-faster", mdl, raw,
                 str(tmp_path / "hclg.fst"), f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/ls.ark"]) == 0
    assert main(["nnet3-latgen-faster-parallel", "--num-threads=3",
                 mdl, raw, str(tmp_path / "hclg.fst"),
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/lp.ark"]) == 0
    a = dict(SequentialTableReader(f"ark:{tmp_path}/ls.ark",
                                   holder="clat"))
    b = dict(SequentialTableReader(f"ark:{tmp_path}/lp.ark",
                                   holder="clat"))
    assert set(a) == set(b)
    for k in a:
        pa = {w_: c for w_, c in a[k].paths()}
        pb = {w_: c for w_, c in b[k].paths()}
        assert set(pa) == set(pb)
        for w_ in pa:
            assert pa[w_] == pytest.approx(pb[w_], abs=1e-4)


def test_disc_egs_merge_subset_compute(tmp_path, rng):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    phones = [1, 2]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 4
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "d.mdl")
    write_mdl(mdl, tm, am)
    T = 6

    def tids_of(phone):
        first = next(t for t in range(1, tm.num_transition_ids + 1)
                     if tm.transition_id_to_phone(t) == phone
                     and tm.transition_id_to_hmm_state(t) == 0
                     and not tm.is_self_loop(t))
        loop = next(t for t in range(1, tm.num_transition_ids + 1)
                    if tm.transition_id_to_phone(t) == phone
                    and tm.transition_id_to_hmm_state(t) == 0
                    and tm.is_self_loop(t))
        return [first] + [loop] * (T - 1)

    with TableWriter(f"ark:{tmp_path}/lats.ark", holder="clat") as lw, \
            TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as fw, \
            TableWriter(f"ark:{tmp_path}/a.ark", holder="ivec") as aw:
        for i in range(3):
            clat = CompactLattice()
            s0, s1 = clat.add_state(), clat.add_state()
            clat.start = s0
            clat.arcs[s0].append(CompactArc(1, 0.5, 0.0,
                                            tuple(tids_of(1)), s1))
            clat.arcs[s0].append(CompactArc(2, 0.7, 0.0,
                                            tuple(tids_of(2)), s1))
            clat.finals[s1] = (0.0, 0.0, ())
            lw[f"u{i}"] = clat
            fw[f"u{i}"] = rng.standard_normal((T, D)).astype(np.float32)
            aw[f"u{i}"] = np.asarray(
                [tm.transition_id_to_pdf(t) for t in tids_of(1)],
                np.int32)
    assert main(["nnet3-discriminative-get-egs", mdl,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a.ark",
                 f"ark:{tmp_path}/lats.ark",
                 f"ark:{tmp_path}/degs.ark"]) == 0
    assert main(["nnet3-discriminative-merge-egs",
                 "--minibatch-size=2", f"ark:{tmp_path}/degs.ark",
                 f"ark:{tmp_path}/dm.ark"]) == 0
    assert len(dict(SequentialTableReader(f"ark:{tmp_path}/dm.ark",
                                          holder="deg"))) == 3
    assert main(["nnet3-discriminative-subset-egs", "--n=2",
                 f"ark:{tmp_path}/degs.ark",
                 f"ark:{tmp_path}/ds.ark"]) == 0
    assert len(dict(SequentialTableReader(f"ark:{tmp_path}/ds.ark",
                                          holder="deg"))) == 2
    raw, _cfg = _raw_model(tmp_path, rng, D, tree.num_pdfs, "d.raw",
                           sub=1)
    assert main(["nnet3-discriminative-compute-from-egs", raw,
                 f"ark:{tmp_path}/degs.ark",
                 f"ark:{tmp_path}/out.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="mat"))
    assert len(out) == 3
    assert out["u0"].shape == (T, tree.num_pdfs)


def test_chain_e2e_get_egs_and_train(tmp_path, rng):
    """Flat-start CLI flow: transcripts + feats → e2e egs (FSA wire
    format round-trips) → nnet3-chain-train with free-boundary
    tolerance runs and writes a model."""
    from kaldi_tpu.am.serialize import write_mdl
    phones = [1, 2, 3]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    D = 5
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D))
    mdl = str(tmp_path / "e2e.mdl")
    write_mdl(mdl, tm, am)
    proto = {p: 2.0 * rng.standard_normal(D) for p in phones}
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as fw, \
            TableWriter(f"ark:{tmp_path}/t.ark", holder="ivec") as tw:
        for i in range(4):
            seq = [int(p) for p in rng.permutation(phones)]
            fs = []
            for ph in seq:
                fs.extend([proto[ph] + 0.2 * rng.standard_normal(D)
                           for _ in range(9)])
            fw[f"u{i}"] = np.asarray(fs, np.float32)
            tw[f"u{i}"] = np.asarray(seq, np.int32)
    assert main(["nnet3-chain-e2e-get-egs", mdl,
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/t.ark",
                 f"ark:{tmp_path}/egs.ark",
                 str(tmp_path / "den.fst")]) == 0
    # the FSA rides the wire: read an entry back and check it
    got = dict(SequentialTableReader(f"ark:{tmp_path}/egs.ark",
                                     holder="ceg"))
    eg = next(iter(got.values()))
    assert eg.fsa is not None
    assert len(eg.fsa.src) == 3          # one arc per phone
    assert eg.fsa.num_frames == 9        # 27 frames / subsample 3
    # flat-start train from a random raw model
    raw, _cfg = _raw_model(tmp_path, rng, D, tree.num_pdfs, "e.raw")
    with TableWriter(f"ark:{tmp_path}/ph.ark", holder="ivec") as w:
        for i in range(4):
            w[f"u{i}"] = np.asarray(phones, np.int32)
    assert main(["nnet3-chain-train", "--num-epochs=2",
                 "--supervision-tolerance=9", mdl, raw,
                 f"ark:{tmp_path}/ph.ark", f"ark:{tmp_path}/egs.ark",
                 str(tmp_path / "trained.raw")]) == 0
    assert (tmp_path / "trained.raw").exists()
