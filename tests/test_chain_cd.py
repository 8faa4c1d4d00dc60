"""Context-dependent (left-biphone) chain trees through the product
path: build_chain_tree (steps/nnet3/chain/build_tree.sh role), the
(lm-state, left-phone)-expanded denominator graph
(am/chain.py _make_den_graph_biphone), CD numerator egs, the biglang
decode graph over a (2,1) tree, and an end-to-end train smoke."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, TransitionModel
from kaldi_tpu.am.chain import make_denominator_graph
from kaldi_tpu.am.tree import GaussStats, build_tree
from kaldi_tpu.pipelines.tri import cluster_phone_questions

PHONES = [1, 2, 3, 4]


def _biphone_tree(rng, leaves=12):
    """A (2,1) tree over chain pdf-classes with left-context splits."""
    topo = HmmTopology.chain(PHONES)
    stats = {}
    for ph in PHONES:
        for left in [0] + PHONES:
            for pc in range(2):
                g = GaussStats(2)
                mean = np.array([ph + 0.3 * left, 0.7 * pc])
                for _ in range(5):
                    g.accumulate(mean + 0.05 * rng.standard_normal(2))
                stats[((left, ph), pc)] = g
    questions = cluster_phone_questions(stats, central_position=1)
    tree = build_tree(stats, questions, 2, 1, max_leaves=leaves)
    assert tree.context_width == 2 and tree.central_position == 1
    return tree, topo


def _phone_seqs(rng, n=40):
    return [[PHONES[int(k)] for k in rng.integers(0, len(PHONES),
                                                  int(rng.integers(2, 7)))]
            for _ in range(n)]


def test_biphone_den_graph_invariants():
    rng = np.random.default_rng(3)
    tree, topo = _biphone_tree(rng)
    den = make_denominator_graph(_phone_seqs(rng), tree, topo, order=3)
    S = den.num_states
    # every length-2 history is its own (lm, left) state; backoff
    # states appear once per arriving left context (and drop out
    # entirely when unreachable in the closed graph)
    n_len2 = sum(1 for h in den.lm.hists if len(h) == 2)
    assert S >= n_len2
    # entry pdf is a function of the destination state (the dense
    # recursion's requirement)
    cross = den.src != den.dst
    assert (den.pdf[cross]
            == den.state_entry_pdf[den.dst[cross]]).all()
    # per-state outgoing mass (self + cross + final) is exactly 1
    mass = np.zeros(S)
    np.add.at(mass, den.src, np.exp(den.logw.astype(np.float64)))
    mass += np.exp(den.final.astype(np.float64))
    assert np.allclose(mass, 1.0, atol=1e-4)
    # left-context actually matters: some phone has context-split
    # entry pdfs across states with the same center phone
    last = np.asarray([h[-1] for h in den.lm.hists])
    eg = np.asarray([g for g, _ in
                     sorted(den.exp_index, key=den.exp_index.get)])
    centers = last[eg]
    split = False
    for c in set(centers.tolist()):
        pdfs = set(den.state_entry_pdf[centers == c].tolist())
        if len(pdfs) > 1:
            split = True
    assert split, "tree did not split on left context"
    # norm_view arrays are per-LM-state
    nv = den.norm_view()
    assert all(len(a) == den.lm.num_states for a in nv)
    # initial_for resolves exact expanded states for 2-phone histories
    h = den.lm.hists[[i for i, x in enumerate(den.lm.hists)
                      if len(x) == 2][0]]
    hist_ids = [den.lm.phones[i] for i in h]
    assert np.isfinite(den.initial_for(hist_ids))


def test_biphone_den_matches_mono_shape_when_context_free():
    """A width-2 tree that never splits on the left phone must give
    the same den forward scores as the mono construction."""
    import jax.numpy as jnp

    from kaldi_tpu.am.chain import denominator_logprob
    from kaldi_tpu.am.tree import MonophoneContextDependency
    rng = np.random.default_rng(5)
    topo = HmmTopology.chain(PHONES)
    # context-free "biphone" tree: stats identical across left context
    stats = {}
    for ph in PHONES:
        for left in [0] + PHONES:
            for pc in range(2):
                g = GaussStats(2)
                mean = np.array([3.0 * ph, 2.0 * pc])
                for _ in range(5):
                    g.accumulate(mean + 0.01 * rng.standard_normal(2))
                stats[((left, ph), pc)] = g
    questions = cluster_phone_questions(stats, central_position=1)
    tree2 = build_tree(stats, questions, 2, 1,
                       max_leaves=2 * len(PHONES))
    mono = MonophoneContextDependency(PHONES, topo)
    seqs = _phone_seqs(rng)
    den2 = make_denominator_graph(seqs, tree2, topo, order=2)
    den1 = make_denominator_graph(seqs, mono, topo, order=2)
    # same number of pdfs and — because the tree is context-free — a
    # 1:1 pdf relabeling; compare den log-probs on relabeled scores
    B, T = 3, 12
    x1 = rng.standard_normal((B, T, den1.pdf.max() + 1)).astype(
        np.float32)
    # build pdf map mono->tree2 via center phone/class
    x2 = np.zeros((B, T, int(den2.pdf.max()) + 1), np.float32)
    for ph in PHONES:
        st = topo.topology_for_phone(ph)[0]
        for pc, cls in ((0, st.forward_pdf_class),
                        (1, st.self_loop_pdf_class)):
            p1 = mono.compute([ph], cls)
            p2 = tree2.compute([0, ph], cls)
            x2[:, :, p2] = x1[:, :, p1]
    z1 = np.asarray(denominator_logprob(den1, jnp.asarray(x1)))
    z2 = np.asarray(denominator_logprob(den2, jnp.asarray(x2)))
    np.testing.assert_allclose(z1, z2, rtol=1e-4, atol=1e-3)


def test_biphone_biglang_matches_mkgraph():
    """Decode-graph parity at (2,1): exhaustive (tids, words) path map
    of the direct construction equals the generic mkgraph pipeline."""
    from tests.test_biglang_cd import _all_paths, _lexicon
    from kaldi_tpu.fst import Lang, Lexicon, arpa_to_fst, mkgraph
    from kaldi_tpu.fst.arpa import estimate_arpa
    from kaldi_tpu.fst.biglang import build_big_graph
    from kaldi_tpu.fst.csr import pack_fst

    rng = np.random.default_rng(7)
    entries = _lexicon(rng, 3)
    ws = [w for w, _ in entries]
    texts = [[ws[int(k)] for k in rng.integers(0, len(ws),
                                               int(rng.integers(1, 6)))]
             for _ in range(150)]
    arpa = estimate_arpa(texts, order=2, prune_count=1, vocab=ws)
    lex = Lexicon(list(entries))
    lang = Lang(lex)
    pl = lang.phone_list()
    topo = HmmTopology.chain(pl)
    stats = {}
    for ph in pl:
        for left in [0] + pl:
            for pc in range(2):
                g = GaussStats(2)
                mean = np.array([ph + 0.31 * left, 0.9 * pc])
                for _ in range(4):
                    g.accumulate(mean + 0.05 * rng.standard_normal(2))
                stats[((left, ph), pc)] = g
    questions = cluster_phone_questions(stats, central_position=1)
    tree = build_tree(stats, questions, 2, 1, max_leaves=20)
    tm = TransitionModel(topo, tree)
    csr_ref = pack_fst(mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                               self_loop_scale=1.0))
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    t2p = tm.tid_to_pdf_array
    for T in (1, 2, 3, 4):
        ref = _all_paths(csr_ref, T, t2p)
        got = _all_paths(big.csr, T, t2p)
        assert set(ref) == set(got), (
            f"T={T}: {len(ref)} ref vs {len(got)} paths")
        for k, c in ref.items():
            assert abs(got[k] - c) < 1e-3, (T, k, c, got[k])


def test_chain_cd_train_smoke():
    """build_chain_tree from a GMM alignment + biphone den graph + CD
    egs train end-to-end: objf finite, ≤ 0 (normalized), improves."""
    from kaldi_tpu.pipelines.chain import (ChainTrainConfig, ChainTrainer,
                                           build_chain_tree,
                                           make_chain_egs,
                                           phone_alignment_runs)
    from kaldi_tpu.am.tdnn import TdnnConfig

    rng = np.random.default_rng(11)
    topo3 = HmmTopology.three_state(PHONES)
    from kaldi_tpu.am.tree import MonophoneContextDependency
    tree3 = MonophoneContextDependency(PHONES, topo3)
    tm3 = TransitionModel(topo3, tree3)
    # synthetic alignments: random phone runs of 3-6 frames
    feats, ali = {}, {}
    D = 8
    for u in range(12):
        tids = []
        for _ in range(int(rng.integers(3, 7))):
            ph = PHONES[int(rng.integers(len(PHONES)))]
            dur = int(rng.integers(3, 7))
            # entry tid then self-loops per state: walk the 3 states
            for st in range(3):
                ts = tm3.tuple_to_transition_state(
                    ph, st, tree3.compute([ph], st),
                    tree3.compute([ph], st))
                tids.append(tm3.pair_to_transition_id(ts, 0))
                for _ in range(max(0, dur // 3 - 1)):
                    tids.append(tm3.self_loop_of(ts))
        key = f"u{u}"
        ali[key] = tids
        feats[key] = rng.standard_normal((len(tids), D)).astype(
            np.float32)
    chain_topo = HmmTopology.chain(PHONES)
    tree = build_chain_tree(feats, ali, tm3, chain_topo, num_leaves=16)
    assert tree.context_width == 2
    phone_seqs = [tm3.alignment_to_phones(ali[u]) for u in sorted(ali)]
    den = make_denominator_graph(phone_seqs, tree, chain_topo, order=2)
    runs = {u: phone_alignment_runs(tm3, ali[u]) for u in ali}
    egs = make_chain_egs(feats, runs, tree, chain_topo, chunk_size=9,
                         subsample=3, den=den)
    cfg = TdnnConfig(feat_dim=D, num_pdfs=tree.num_pdfs, hidden_dim=32,
                     bottleneck_dim=16, num_layers=2,
                     frame_subsampling_factor=3)
    trainer = ChainTrainer(cfg, den, ChainTrainConfig(
        num_epochs=2, batch_size=4, learning_rate=1e-3), seed=0)
    out = trainer.train(egs)
    assert np.isfinite(out["objf"])
    assert out["objf"] <= 0.05    # normalized MMI ratio stays ≤ ~0


def test_largevocab_biphone_context_option():
    """make_largevocab_task(context='biphone') builds a decodable CD
    graph: synthetic loglikes peaked on context-aware pdfs decode at
    ~0 WER through the BeamDecoder."""
    import numpy as np
    from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
    from kaldi_tpu.pipelines.largevocab import (make_largevocab_task,
                                                sample_eval_set,
                                                synth_loglikes)
    from kaldi_tpu.pipelines.score import compute_wer
    task = make_largevocab_task(vocab_size=300, num_phones=12,
                                corpus_sentences=800, seed=3,
                                context="biphone")
    assert task.tree.context_width == 2
    # context-dependence is real: some phone has split left contexts
    pl = sorted(task.topo.phones)
    split = any(len({task.pdf_pair(l, p)[0] for l in [0] + pl}) > 1
                for p in pl)
    assert split
    eval_set = sample_eval_set(task, 12, max_words=5, seed=5)
    rng = np.random.default_rng(9)
    lls = {u: synth_loglikes(task, s, rng, noise=0.3, peak=6.0)
           for u, s in eval_set.items()}
    dec = BeamDecoder(task.graph.csr, task.tm.tid_to_pdf_array,
                      BeamDecoderConfig(beam=13.0, max_active=2000,
                                        acoustic_scale=1.0,
                                        lattice_beam=6.0,
                                        arc_budget=8192,
                                        lattice_arcs_per_frame=2048))
    hyps = {}
    for u in sorted(lls):
        clat = dec.decode_compact(lls[u], bucket=16)
        hyps[u] = [task.words.find(w) for w in clat.best_path()[0]]
    wer = compute_wer(eval_set, hyps)
    assert wer.wer < 5.0, str(wer)
