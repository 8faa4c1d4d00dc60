"""Mesh/sharding tests on the 8 virtual CPU devices.

Covers SURVEY.md §2.4 rows: data-parallel decode (sharded batch ==
single-device results), data+model-parallel chain training step, and
psum-style stat reduction replacing gmm-sum-accs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, TransitionModel
from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
from kaldi_tpu.fst import (
    ArpaModel,
    Lang,
    Lexicon,
    arpa_to_fst,
    make_unigram_arpa,
    mkgraph,
)
from kaldi_tpu.parallel import make_mesh
from kaldi_tpu.parallel.decode import ShardedDecoder


@pytest.fixture(scope="module")
def setup():
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words))
    return lang, tm, HCLG


def test_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh()   # all devices on data
    assert mesh2.shape["data"] == jax.device_count()


def test_sharded_decode_matches_single(setup):
    lang, tm, HCLG = setup
    rng = np.random.default_rng(0)
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1))
    B, T, Pn = 11, 30, tm.num_pdfs     # deliberately not divisible by 8
    lls = rng.standard_normal((B, T, Pn)).astype(np.float32)
    lens = rng.integers(10, T + 1, B).astype(np.int32)
    ref = dec.decode_batch(lls, lens)

    mesh = make_mesh(data=8, model=1)
    sharded = ShardedDecoder(dec, mesh)
    got = sharded.decode_batch(lls, lens)
    assert len(got) == B
    for (gt, go, gc), (rt, ro, rc) in zip(got, ref):
        assert gt == rt
        assert go == ro
        assert abs(gc - rc) < 1e-3


def test_psum_stat_reduction():
    """GMM sufficient stats reduce across shards with psum — the
    gmm-sum-accs replacement."""
    from functools import partial
    mesh = make_mesh(data=8, model=1)
    B, P_, M, D = 8, 3, 2, 4
    rng = np.random.default_rng(1)
    local_occ = rng.random((B, P_, M)).astype(np.float32)

    @partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def reduce_stats(occ):
        return jnp.sum(occ, axis=0)

    with mesh:
        occ_sh = jax.device_put(local_occ, NamedSharding(mesh, P("data")))
        total = reduce_stats(occ_sh)
    np.testing.assert_allclose(np.asarray(total), local_occ.sum(0),
                               rtol=1e-5)


def test_chain_train_step_sharded_matches_unsharded():
    """One chain train step on a (4,2) mesh must match the single-device
    step numerically (same init, same batch)."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.pipelines.chain import ChainEgs, ChainTrainConfig, \
        ChainTrainer

    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    den = make_denominator_graph([[1, 2], [2, 1]], tree, topo)
    cfg = TdnnConfig(feat_dim=6, num_pdfs=tree.num_pdfs, hidden_dim=8,
                     bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    rng = np.random.default_rng(0)
    B, T = 8, 12
    egs = ChainEgs(
        feats=rng.standard_normal((B, T, 6)).astype(np.float32),
        pdf_ali=rng.integers(0, tree.num_pdfs, (B, T // 3)).astype(np.int32),
        mask=np.ones((B, T // 3), bool))

    t1 = ChainTrainer(cfg, den, ChainTrainConfig(num_epochs=1, batch_size=B),
                      seed=7)
    r1 = t1.train(egs, log_every=100)

    mesh = make_mesh(data=4, model=2)
    t2 = ChainTrainer(cfg, den, ChainTrainConfig(num_epochs=1, batch_size=B),
                      mesh=mesh, seed=7)
    with mesh:
        r2 = t2.train(egs, log_every=100)
    assert abs(r1["loss"] - r2["loss"]) < 1e-3


def test_sharded_beam_decode_matches_single(setup):
    """ShardedBeamDecoder (large-graph sort decoder over the data
    axis, graph replicated) must produce the same determinized
    lattices as the single-device fused path."""
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.fst.csr import pack_fst
    from kaldi_tpu.parallel.decode import ShardedBeamDecoder
    lang, tm, HCLG = setup
    rng = np.random.default_rng(5)
    dec = BeamDecoder(pack_fst(HCLG), tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=16.0, max_active=256,
                                        acoustic_scale=0.5,
                                        lattice_beam=6.0,
                                        lattice_arcs_per_frame=512,
                                        record_capacity=8192))
    B, T, Pn = 5, 18, tm.num_pdfs     # not divisible by 8
    lls = rng.standard_normal((B, T, Pn)).astype(np.float32)
    lens = rng.integers(10, T + 1, B).astype(np.int32)

    mesh = make_mesh(data=8, model=1)
    sharded = ShardedBeamDecoder(dec, mesh)
    got = sharded.decode_compact_batch(lls, lens)
    assert len(got) == B
    for b in range(B):
        ref = dec.decode_compact(lls[b, :int(lens[b])], bucket=1)
        gw, gt, gc = got[b].best_path()
        rw, rt, rc = ref.best_path()
        assert gw == rw and gt == rt and abs(gc - rc) < 1e-3
        assert dict(got[b].paths()) == pytest.approx(dict(ref.paths()),
                                                     abs=1e-3)
