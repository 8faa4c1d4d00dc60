"""CLI bank 26: nnet2bin tail — raw nets, model surgery, priors,
egs plumbing, ensemble/parallel training, threaded decode."""

import contextlib
import io

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(26)


def _init_nnet2(tmp_path, name="m.nnet2", feat_dim=5, num_pdfs=7,
                seed=0):
    path = str(tmp_path / name)
    assert main(["nnet-am-init", f"--feat-dim={feat_dim}",
                 f"--num-pdfs={num_pdfs}", "--num-hidden-layers=2",
                 "--pnorm-input-dim=16", "--pnorm-output-dim=8",
                 f"--srand={seed}", path]) == 0
    return path


def _write_feats(tmp_path, rng, utts=("u1", "u2"), T=12, D=5):
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        for u in utts:
            w[u] = rng.standard_normal((T, D)).astype(np.float32)
    return f"ark:{tmp_path}/f.ark"


def _write_ali(tmp_path, rng, utts=("u1", "u2"), T=12, P=7,
               name="ali.ark"):
    with TableWriter(f"ark:{tmp_path}/{name}", holder="ivec") as w:
        for u in utts:
            w[u] = rng.integers(0, P, T).astype(np.int32)
    return f"ark:{tmp_path}/{name}"


def _make_egs(tmp_path, rng, prov=False, B=4):
    feats = _write_feats(tmp_path, rng)
    ali = _write_ali(tmp_path, rng)
    # context ±2 matches the model's splice (-2..2): egs are
    # pre-spliced windows the model consumes without re-splicing
    args = ["nnet-get-egs", "--left-context=2", "--right-context=2",
            f"--batch-size={B}"]
    if prov:
        args.append("--provenance-keys=true")
    args += [feats, ali, f"ark:{tmp_path}/egs.ark"]
    assert main(args) == 0
    return f"ark:{tmp_path}/egs.ark", ali


# ---------------------------------------------------------------------------
# raw nets


def test_nnet_init_and_raw_info(tmp_path, capsys):
    (tmp_path / "cfg").write_text(
        "feat-dim = 5\nnum-pdfs = 7\nnum-hidden-layers = 2\n"
        "pnorm-input-dim = 16\npnorm-output-dim = 8\n"
        "splice = -1 0 1\n")
    assert main(["nnet-init", str(tmp_path / "cfg"),
                 str(tmp_path / "raw")]) == 0
    assert main(["raw-nnet-info", str(tmp_path / "raw")]) == 0
    out = capsys.readouterr().out
    assert "num-components" in out and "pnorm" in out
    # splice(3) then 2× [affine pnorm normalize] then affine logsoftmax
    assert "num-components 9" in out


def test_nnet_to_raw_nnet_forward_equivalence(tmp_path, rng):
    """Raw-net forward must equal the Nnet2Model forward."""
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    from kaldi_tpu.am.raw_nnet import forward, load_raw_nnet
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-to-raw-nnet", mdl, str(tmp_path / "raw")]) == 0
    comps = load_raw_nnet(str(tmp_path / "raw"))
    params, cfg = load_nnet2(mdl)
    x = rng.standard_normal((10, 5)).astype(np.float32)
    want = np.asarray(Nnet2Model(cfg).apply(
        {"params": params}, jnp.asarray(x)[None]))[0]
    got = np.asarray(forward(comps, x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_nnet1_to_raw_nnet_and_concat(tmp_path, rng):
    proto = ("<AffineTransform> <InputDim> 5 <OutputDim> 6\n"
             "<AffineTransform> <InputDim> 6 <OutputDim> 4\n")
    (tmp_path / "p").write_text(proto)
    assert main(["nnet-initialize", str(tmp_path / "p"),
                 str(tmp_path / "m1.nnet")]) == 0
    assert main(["nnet1-to-raw-nnet", str(tmp_path / "m1.nnet"),
                 str(tmp_path / "raw1")]) == 0
    from kaldi_tpu.am.raw_nnet import forward, load_raw_nnet
    comps = load_raw_nnet(str(tmp_path / "raw1"))
    assert [c for c, _ in comps] == ["affine", "sigmoid", "affine",
                                     "logsoftmax"]
    # concat: 4-dim output feeds a 4-dim-input second net
    proto2 = "<AffineTransform> <InputDim> 4 <OutputDim> 3\n"
    (tmp_path / "p2").write_text(proto2)
    assert main(["nnet-initialize", str(tmp_path / "p2"),
                 str(tmp_path / "m2.nnet")]) == 0
    assert main(["nnet1-to-raw-nnet", str(tmp_path / "m2.nnet"),
                 str(tmp_path / "raw2")]) == 0
    assert main(["raw-nnet-concat", str(tmp_path / "raw1"),
                 str(tmp_path / "raw2"), str(tmp_path / "cat")]) == 0
    cat = load_raw_nnet(str(tmp_path / "cat"))
    assert len(cat) == len(comps) + 2          # affine + logsoftmax
    x = rng.standard_normal((6, 5)).astype(np.float32)
    out = np.asarray(forward(cat, x))
    assert out.shape == (6, 3)
    # dim mismatch must be rejected
    assert main(["raw-nnet-concat", str(tmp_path / "raw2"),
                 str(tmp_path / "raw2"), str(tmp_path / "bad")]) != 0


def test_raw_nnet_copy_truncate(tmp_path):
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-to-raw-nnet", mdl, str(tmp_path / "raw")]) == 0
    assert main(["raw-nnet-copy", "--truncate=4",
                 str(tmp_path / "raw"), str(tmp_path / "head")]) == 0
    from kaldi_tpu.am.raw_nnet import load_raw_nnet
    assert len(load_raw_nnet(str(tmp_path / "head"))) == 4


# ---------------------------------------------------------------------------
# priors + forward


def test_adjust_priors_and_am_compute(tmp_path, rng):
    from kaldi_tpu.core import io as kio
    mdl = _init_nnet2(tmp_path)
    counts = rng.integers(1, 50, 7).astype(np.float64)
    with kio.open_wxfilename(str(tmp_path / "counts.vec")) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_vector(f, counts.astype(np.float32))
    assert main(["nnet-adjust-priors", mdl,
                 str(tmp_path / "counts.vec"),
                 str(tmp_path / "mp.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    _p, _cfg, priors = load_nnet2_full(str(tmp_path / "mp.nnet2"))
    assert priors is not None and len(priors) == 7
    np.testing.assert_allclose(np.sum(priors), 1.0, atol=1e-5)
    feats = _write_feats(tmp_path, rng, utts=("u1",))
    # posterior vs divide-by-priors outputs differ by the log-prior
    assert main(["nnet-am-compute", str(tmp_path / "mp.nnet2"),
                 feats, f"ark:{tmp_path}/post.ark"]) == 0
    assert main(["nnet-am-compute", "--divide-by-priors=true",
                 str(tmp_path / "mp.nnet2"), feats,
                 f"ark:{tmp_path}/ll.ark"]) == 0
    post = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                      holder="mat"))["u1"]
    ll = dict(SequentialTableReader(f"ark:{tmp_path}/ll.ark",
                                    holder="mat"))["u1"]
    logpri = np.log(np.asarray(priors) / np.sum(priors))
    np.testing.assert_allclose(ll, post - logpri[None, :].astype(
        np.float32), atol=1e-4)


def test_train_transitions(tmp_path, rng):
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.am.serialize import (read_transition_model,
                                        write_transition_model)
    from kaldi_tpu.core import io as kio
    topo = HmmTopology.three_state([1, 2])
    tree = MonophoneContextDependency([1, 2], topo)
    tm = TransitionModel(topo, tree)
    with kio.open_wxfilename(str(tmp_path / "trans.mdl")) as f:
        kio.init_kaldi_output_stream(f)
        write_transition_model(f, tm)
    mdl = _init_nnet2(tmp_path, num_pdfs=tm.num_pdfs)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u1"] = rng.integers(1, tm.num_transition_ids + 1,
                               30).astype(np.int32)
    assert main(["nnet-train-transitions", str(tmp_path / "trans.mdl"),
                 f"ark:{tmp_path}/ali.ark", mdl,
                 str(tmp_path / "trans2.mdl"),
                 str(tmp_path / "m2.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import load_nnet2_full
    _p, _cfg, priors = load_nnet2_full(str(tmp_path / "m2.nnet2"))
    assert priors is not None
    with kio.open_rxfilename(str(tmp_path / "trans2.mdl")) as f:
        kio.init_kaldi_input_stream(f)
        tm2 = read_transition_model(f)
    assert tm2.num_transition_ids == tm.num_transition_ids


# ---------------------------------------------------------------------------
# egs plumbing


def test_copy_subset_egs(tmp_path, rng):
    egs, _ali = _make_egs(tmp_path, rng)
    assert main(["nnet-copy-egs", egs, f"ark:{tmp_path}/e1.ark",
                 f"ark:{tmp_path}/e2.ark"]) == 0
    n_in = len(list(SequentialTableReader(egs, holder="xeg")))
    n1 = len(list(SequentialTableReader(f"ark:{tmp_path}/e1.ark",
                                        holder="xeg")))
    n2 = len(list(SequentialTableReader(f"ark:{tmp_path}/e2.ark",
                                        holder="xeg")))
    assert n1 + n2 == n_in and abs(n1 - n2) <= 1
    assert main(["nnet-subset-egs", "--n=2", egs,
                 f"ark:{tmp_path}/sub.ark"]) == 0
    assert len(list(SequentialTableReader(f"ark:{tmp_path}/sub.ark",
                                          holder="xeg"))) == 2


def test_relabel_egs(tmp_path, rng):
    egs, _ali = _make_egs(tmp_path, rng, prov=True)
    # new alignments: everything is pdf 3
    with TableWriter(f"ark:{tmp_path}/ali2.ark", holder="ivec") as w:
        for u in ("u1", "u2"):
            w[u] = np.full(12, 3, np.int32)
    assert main(["nnet-relabel-egs", f"ark:{tmp_path}/ali2.ark", egs,
                 f"ark:{tmp_path}/re.ark"]) == 0
    for _k, eg in SequentialTableReader(f"ark:{tmp_path}/re.ark",
                                        holder="xeg"):
        assert (eg.pdfs == 3).all()
    # egs without provenance keys are rejected
    egs2, _ = _make_egs(tmp_path, rng, prov=False)
    assert main(["nnet-relabel-egs", f"ark:{tmp_path}/ali2.ark",
                 egs2, f"ark:{tmp_path}/re2.ark"]) != 0


def test_compute_prob_and_show_progress(tmp_path, rng, capsys):
    egs, _ali = _make_egs(tmp_path, rng)
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-compute-prob", mdl, egs]) == 0
    val = float(capsys.readouterr().out.strip().splitlines()[-1])
    assert -20.0 < val < 0.0
    mdl2 = _init_nnet2(tmp_path, name="m2.nnet2", seed=5)
    assert main(["nnet-show-progress", mdl, mdl2, egs]) == 0
    out = capsys.readouterr().out
    assert "rel-change" in out and "objf-old" in out


# ---------------------------------------------------------------------------
# training


def test_train_parallel_improves(tmp_path, rng, capsys):
    egs, _ali = _make_egs(tmp_path, rng)
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-compute-prob", mdl, egs]) == 0
    before = float(capsys.readouterr().out.strip().splitlines()[-1])
    cur = mdl
    for it in range(3):
        nxt = str(tmp_path / f"it{it}.nnet2")
        assert main(["nnet-train-parallel", "--num-threads=2",
                     "--learning-rate=0.2", cur, egs, nxt]) == 0
        cur = nxt
    assert main(["nnet-compute-prob", cur, egs]) == 0
    after = float(capsys.readouterr().out.strip().splitlines()[-1])
    assert after > before


def test_train_parallel_preconditioned(tmp_path, rng):
    egs, _ali = _make_egs(tmp_path, rng)
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-am-switch-preconditioning", mdl,
                 str(tmp_path / "pc.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import load_nnet2
    _p, cfg = load_nnet2(str(tmp_path / "pc.nnet2"))
    assert cfg.preconditioned
    assert main(["nnet-train-parallel", "--num-threads=2",
                 str(tmp_path / "pc.nnet2"), egs,
                 str(tmp_path / "pc2.nnet2")]) == 0


def test_train_ensemble(tmp_path, rng):
    egs, _ali = _make_egs(tmp_path, rng)
    m1 = _init_nnet2(tmp_path, name="e1.nnet2", seed=1)
    m2 = _init_nnet2(tmp_path, name="e2.nnet2", seed=2)
    assert main(["nnet-train-ensemble", "--beta=0.5",
                 "--learning-rate=0.1", egs, m1, m2,
                 str(tmp_path / "o1.nnet2"),
                 str(tmp_path / "o2.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import load_nnet2
    p1, _ = load_nnet2(str(tmp_path / "o1.nnet2"))
    p2, _ = load_nnet2(str(tmp_path / "o2.nnet2"))
    # the two ensemble members stay distinct
    k1 = np.asarray(p1["output_affine"]["kernel"])
    k2 = np.asarray(p2["output_affine"]["kernel"])
    assert not np.allclose(k1, k2)


def test_nnet_combine_alias(tmp_path, rng):
    feats = _write_feats(tmp_path, rng)
    ali = _write_ali(tmp_path, rng)
    m1 = _init_nnet2(tmp_path, name="c1.nnet2", seed=1)
    m2 = _init_nnet2(tmp_path, name="c2.nnet2", seed=2)
    assert main(["nnet-combine", "--num-iters=5", feats, ali, m1, m2,
                 str(tmp_path / "comb.nnet2")]) == 0
    from kaldi_tpu.am.nnet2 import load_nnet2
    load_nnet2(str(tmp_path / "comb.nnet2"))


# ---------------------------------------------------------------------------
# surgery


def test_nnet_insert(tmp_path, rng):
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-insert", mdl, str(tmp_path / "ins.nnet2")]) == 0
    params, cfg = load_nnet2(str(tmp_path / "ins.nnet2"))
    assert cfg.num_hidden_layers == 3
    x = rng.standard_normal((1, 10, 5)).astype(np.float32)
    out = Nnet2Model(cfg).apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 10, 7)


def test_replace_last_layers(tmp_path, rng):
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    mdl = _init_nnet2(tmp_path)
    old_params, _ = load_nnet2(mdl)
    assert main(["nnet-replace-last-layers", "--num-pdfs=11",
                 "--num-layers-to-remove=1", mdl,
                 str(tmp_path / "rep.nnet2")]) == 0
    params, cfg = load_nnet2(str(tmp_path / "rep.nnet2"))
    assert cfg.num_pdfs == 11
    # kept layer 1 is byte-identical
    np.testing.assert_array_equal(
        np.asarray(params["pnorm1"]["affine"]["kernel"]),
        np.asarray(old_params["pnorm1"]["affine"]["kernel"]))
    x = rng.standard_normal((1, 10, 5)).astype(np.float32)
    out = Nnet2Model(cfg).apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 10, 11)


def test_am_widen(tmp_path, rng):
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    mdl = _init_nnet2(tmp_path)
    assert main(["nnet-am-widen", "--hidden-layer-dim=24", mdl,
                 str(tmp_path / "wide.nnet2")]) == 0
    params, cfg = load_nnet2(str(tmp_path / "wide.nnet2"))
    assert cfg.pnorm_input_dim == 24
    x = rng.standard_normal((1, 10, 5)).astype(np.float32)
    out = Nnet2Model(cfg).apply({"params": params}, jnp.asarray(x))
    assert out.shape == (1, 10, 7)


def test_am_mixup_preserves_distribution_shape(tmp_path, rng):
    """Mixing up duplicates softmax rows with ~1/n mass each: the
    output distribution right after mixup is close to the original."""
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    mdl = _init_nnet2(tmp_path)
    p0, cfg0 = load_nnet2(mdl)
    assert main(["nnet-am-mixup", "--num-mixtures=12", mdl,
                 str(tmp_path / "mix.nnet2")]) == 0
    params, cfg = load_nnet2(str(tmp_path / "mix.nnet2"))
    assert cfg.mix2pdf is not None and len(cfg.mix2pdf) == 12
    x = jnp.asarray(rng.standard_normal((1, 10, 5)).astype(np.float32))
    out0 = np.asarray(Nnet2Model(cfg0).apply({"params": p0}, x))
    out1 = np.asarray(Nnet2Model(cfg).apply({"params": params}, x))
    assert out1.shape == out0.shape
    np.testing.assert_allclose(np.exp(out1).sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(out1, out0, atol=0.1)
    # already-mixed models are rejected
    assert main(["nnet-am-mixup", "--num-mixtures=20",
                 str(tmp_path / "mix.nnet2"),
                 str(tmp_path / "mix2.nnet2")]) != 0


# ---------------------------------------------------------------------------
# alignment + decoding


def _mono_system(tmp_path, rng):
    """Tiny GMM mono system: lang + trans-model + .mdl on disk."""
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.fst import Lang, Lexicon
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(5), np.ones(5),
                              perturb=0.3)
    write_mdl(str(tmp_path / "g.mdl"), tm, am)
    return lang, tm


def test_nnet_align_compiled(tmp_path, rng):
    from kaldi_tpu.decoder.training_graph import TrainingGraphCompiler
    lang, tm = _mono_system(tmp_path, rng)
    mdl = _init_nnet2(tmp_path, num_pdfs=tm.num_pdfs)
    compiler = TrainingGraphCompiler(lang, tm)
    with TableWriter(f"ark:{tmp_path}/gr.ark", holder="fst") as w:
        w["u1"] = compiler.compile_text(["GO"])
    feats = _write_feats(tmp_path, rng, utts=("u1",))
    assert main(["nnet-align-compiled", str(tmp_path / "g.mdl"), mdl,
                 f"ark:{tmp_path}/gr.ark", feats,
                 f"ark:{tmp_path}/ali.ark"]) == 0
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u1"]
    assert len(ali) == 12
    assert all(1 <= t <= tm.num_transition_ids for t in ali)


def test_nnet_latgen_faster_parallel(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lang, tm = _mono_system(tmp_path, rng)
    mdl = _init_nnet2(tmp_path, num_pdfs=tm.num_pdfs)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    feats = _write_feats(tmp_path, rng, T=20)
    assert main(["nnet-latgen-faster-parallel", "--num-threads=2",
                 "--beam=16", str(tmp_path / "g.mdl"), mdl,
                 str(tmp_path / "HCLG.txt"), feats,
                 f"ark:{tmp_path}/lat.ark"]) == 0
    lats = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                      holder="clat"))
    assert set(lats) == {"u1", "u2"}
    vocab = {lang.words["GO"], lang.words["NO"]}
    for lat in lats.values():
        words, _tids, _cost = lat.best_path()
        assert all(w in vocab for w in words)
