"""Lattice-derived chain supervision (am/chain_supervision.py):
single-path == fixed alignment, path unions == logsumexp over paths,
large tolerance == the flexible-boundary numerator, and lattice-built
FSAs == path-built FSAs."""

import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.am.chain_supervision import (numerator_fsa_logprob,
                                            pack_supervisions,
                                            supervision_from_lattice,
                                            supervision_from_phone_runs)
from kaldi_tpu.am.chain import numerator_logprob
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.tree import MonophoneContextDependency

PHONES = [1, 2, 3]


@pytest.fixture
def pdf_maps():
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)

    def pdfs_for(phone, is_entry):
        window = [0] * tree.context_width
        window[tree.central_position] = phone
        st = topo.topology_for_phone(phone)[0]
        cls = (st.forward_pdf_class if is_entry
               else st.self_loop_pdf_class)
        return tree.compute(window, cls)

    return (lambda p: pdfs_for(p, True), lambda p: pdfs_for(p, False),
            tree.num_pdfs)


def _scores(rng, B, T, P):
    return jnp.asarray(rng.standard_normal((B, T, P)), jnp.float32)


def _ali_from_path(path, e_of, s_of):
    pdfs = []
    for ph, dur in path:
        pdfs.append(e_of(ph))
        pdfs.extend([s_of(ph)] * (dur - 1))
    return np.asarray(pdfs, np.int32)


def test_single_path_tolerance0_equals_fixed_alignment(pdf_maps):
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(0)
    T = 12
    path = [(1, 4), (2, 5), (3, 3)]
    fsa = supervision_from_phone_runs([path], [0.0], e_of, s_of, T)
    sup = pack_supervisions([fsa])
    scores = _scores(rng, 1, T, P)
    got = np.asarray(numerator_fsa_logprob(scores, sup, tolerance=0))
    ali = _ali_from_path(path, e_of, s_of)[None]
    ref = np.asarray(numerator_logprob(scores, jnp.asarray(ali),
                                       jnp.ones((1, T), bool)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_union_equals_logsumexp_of_paths(pdf_maps):
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(1)
    T = 10
    paths = [[(1, 3), (2, 7)], [(1, 5), (3, 5)], [(2, 10)]]
    ws = [-0.3, -1.1, -2.0]
    union = supervision_from_phone_runs(paths, ws, e_of, s_of, T)
    scores = _scores(rng, 1, T, P)
    got = np.asarray(numerator_fsa_logprob(
        scores, pack_supervisions([union]), tolerance=0))
    singles = []
    for p, w in zip(paths, ws):
        f = supervision_from_phone_runs([p], [w], e_of, s_of, T)
        singles.append(np.asarray(numerator_fsa_logprob(
            scores, pack_supervisions([f]), tolerance=0))[0])
    np.testing.assert_allclose(got[0], np.logaddexp.reduce(singles),
                               atol=1e-4)


def test_large_tolerance_equals_free_boundary_enumeration(pdf_maps):
    """tolerance ≥ T = free boundary placement: the FSA forward equals
    brute-force logsumexp over every duration composition (the
    flexible-numerator contract, minus its chunk-start mid-phone
    option which whole-utterance FSAs rightly exclude)."""
    import itertools
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(2)
    T = 9
    path = [(2, 3), (1, 3), (3, 3)]
    fsa = supervision_from_phone_runs([path], [0.0], e_of, s_of, T)
    scores = _scores(rng, 1, T, P)
    got = np.asarray(numerator_fsa_logprob(
        scores, pack_supervisions([fsa]), tolerance=T))
    segs = [ph for ph, _ in path]
    s = np.asarray(scores[0])
    vals = []
    for cut in itertools.combinations(range(1, T), len(segs) - 1):
        bounds = [0] + list(cut) + [T]
        tot = 0.0
        for k, ph in enumerate(segs):
            b, e = bounds[k], bounds[k + 1]
            tot += s[b, e_of(ph)] + sum(
                s[t, s_of(ph)] for t in range(b + 1, e))
        vals.append(tot)
    np.testing.assert_allclose(got[0], np.logaddexp.reduce(vals),
                               atol=1e-3)


def test_tolerance_widens_mass_monotonically(pdf_maps):
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(3)
    T = 12
    path = [(1, 4), (2, 4), (3, 4)]
    fsa = supervision_from_phone_runs([path], [0.0], e_of, s_of, T)
    sup = pack_supervisions([fsa])
    scores = _scores(rng, 1, T, P)
    vals = [float(numerator_fsa_logprob(scores, sup, tolerance=t)[0])
            for t in (0, 1, 2, 4)]
    assert all(b >= a - 1e-5 for a, b in zip(vals, vals[1:]))
    assert vals[-1] > vals[0]       # tolerance really adds paths


def test_batch_padding_independent(pdf_maps):
    """Batched forward == per-item forwards despite shape padding."""
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(4)
    paths = [[(1, 4), (2, 4)], [(3, 5), (1, 5), (2, 2)]]
    Ts = [8, 12]
    fsas = [supervision_from_phone_runs([p], [0.0], e_of, s_of, t)
            for p, t in zip(paths, Ts)]
    Tmax = max(Ts)
    scores = _scores(rng, 2, Tmax, P)
    got = np.asarray(numerator_fsa_logprob(
        scores, pack_supervisions(fsas), tolerance=1))
    for b in (0, 1):
        solo = np.asarray(numerator_fsa_logprob(
            scores[b:b + 1, :Ts[b]],
            pack_supervisions([fsas[b]]), tolerance=1))
        np.testing.assert_allclose(got[b], solo[0], atol=1e-4)


def test_supervision_from_lattice_matches_paths(pdf_maps):
    """A two-alternative CompactLattice (same word, two alignments)
    builds the same numerator as the explicit path union."""
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    tm = TransitionModel(topo, tree)
    fwd_tid, self_tid = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        (self_tid if tm.is_self_loop(tid) else fwd_tid).setdefault(
            ph, tid)

    def tids(path):
        out = []
        for ph, dur in path:
            out.extend([fwd_tid[ph]] + [self_tid[ph]] * (dur - 1))
        return tuple(out)

    # full-rate paths over 18 frames → 6 subsampled frames
    pa = [(1, 9), (2, 9)]
    pb = [(1, 6), (2, 12)]
    clat = CompactLattice()
    s0, s1 = clat.add_state(), clat.add_state()
    clat.start = s0
    clat.arcs[s0].append(CompactArc(7, 0.5, 0.0, tids(pa), s1))
    clat.arcs[s0].append(CompactArc(7, 1.5, 0.0, tids(pb), s1))
    clat.finals[s1] = (0.0, 0.0, ())
    fsa = supervision_from_lattice(clat, tm, e_of, s_of, subsample=3)
    assert fsa.num_frames == 6

    rng = np.random.default_rng(5)
    scores = _scores(rng, 1, 6, P)
    got = np.asarray(numerator_fsa_logprob(
        scores, pack_supervisions([fsa]), tolerance=0))
    # sub-rate paths: boundaries at 9//3=3 and 6//3=2
    ua = supervision_from_phone_runs([[(1, 3), (2, 3)]], [-0.5],
                                     e_of, s_of, 6)
    ub = supervision_from_phone_runs([[(1, 2), (2, 4)]], [-1.5],
                                     e_of, s_of, 6)
    ra = numerator_fsa_logprob(scores, pack_supervisions([ua]), 0)[0]
    rb = numerator_fsa_logprob(scores, pack_supervisions([ub]), 0)[0]
    np.testing.assert_allclose(got[0], np.logaddexp(float(ra),
                                                    float(rb)),
                               atol=1e-4)


def test_make_chain_egs_from_lattices_and_trainer(pdf_maps):
    """Full loop: alignment lattices → egs with packed supervision →
    ChainTrainer (egs.sup path) learns."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.chain_supervision import \
        make_chain_egs_from_lattices
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    from kaldi_tpu.pipelines.chain import ChainTrainConfig, ChainTrainer
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    tm = TransitionModel(topo, tree)
    den = make_denominator_graph([[1, 2, 3], [3, 2, 1]], tree, topo)
    fwd_tid, self_tid = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        (self_tid if tm.is_self_loop(tid) else fwd_tid).setdefault(
            ph, tid)

    def tids(path):
        out = []
        for ph, dur in path:
            out.extend([fwd_tid[ph]] + [self_tid[ph]] * (dur - 1))
        return tuple(out)

    def two_alt_lattice(pa, pb):
        clat = CompactLattice()
        s0, s1 = clat.add_state(), clat.add_state()
        clat.start = s0
        clat.arcs[s0].append(CompactArc(1, 0.0, 0.0, tids(pa), s1))
        clat.arcs[s0].append(CompactArc(1, 0.7, 0.0, tids(pb), s1))
        clat.finals[s1] = (0.0, 0.0, ())
        return clat

    rng = np.random.default_rng(9)
    D = 5
    paths = {"u0": ([(1, 9), (2, 9), (3, 9)], [(1, 12), (2, 6), (3, 9)]),
             "u1": ([(3, 9), (2, 9), (1, 9)], [(3, 6), (2, 12), (1, 9)])}
    lattices = {u: two_alt_lattice(pa, pb)
                for u, (pa, pb) in paths.items()}
    proto = {p: rng.standard_normal(D) for p in PHONES}
    feats = {}
    for u, (pa, _) in paths.items():
        fs = []
        for ph, dur in pa:
            fs.extend([proto[ph] + 0.2 * rng.standard_normal(D)
                       for _ in range(dur)])
        feats[u] = np.asarray(fs, np.float32)
    egs = make_chain_egs_from_lattices(feats, lattices, tm, tree, topo,
                                       subsample=3)
    assert egs.sup is not None
    assert egs.feats.shape[1] == egs.mask.shape[1] * 3
    cfg = TdnnConfig(feat_dim=D, num_pdfs=tree.num_pdfs, hidden_dim=12,
                     bottleneck_dim=6, num_layers=2,
                     frame_subsampling_factor=3)
    tr = ChainTrainer(cfg, den, ChainTrainConfig(
        num_epochs=25, batch_size=2, learning_rate=5e-3,
        supervision_tolerance=1))
    out = tr.train(egs, log_every=1000)
    assert np.isfinite(out["loss"])
    assert out["objf"] > -5.0


def test_chunked_supervision_matches_alignment_slices(pdf_maps):
    """chunk_supervision on a single-path FSA at tolerance 0: each
    chunk's numerator == the fixed-alignment numerator of that chunk's
    pdf slice (mid-phone starts emit the self pdf — exactly what the
    sliced alignment contains)."""
    from kaldi_tpu.am.chain_supervision import chunk_supervision
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(31)
    T = 16
    path = [(1, 5), (2, 6), (3, 5)]
    fsa = supervision_from_phone_runs([path], [0.0], e_of, s_of, T)
    ali = _ali_from_path(path, e_of, s_of)
    scores = _scores(rng, 1, T, P)
    for c0, c1 in [(0, 8), (8, 16), (4, 12), (0, 16)]:
        ck = chunk_supervision(fsa, c0, c1)
        assert ck.mid_start == (c0 > 0) and ck.mid_end == (c1 < T)
        got = float(numerator_fsa_logprob(
            scores[:, c0:c1], pack_supervisions([ck]), tolerance=0)[0])
        ref = float(numerator_logprob(
            scores[:, c0:c1],
            jnp.asarray(ali[None, c0:c1]),
            jnp.ones((1, c1 - c0), bool))[0])
        assert got == pytest.approx(ref, abs=1e-3), (c0, c1)


def test_make_chunked_egs_from_lattices(pdf_maps):
    """chunk_size cuts utterances into fixed chunks; ChainTrainer
    trains on them."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.chain_supervision import \
        make_chain_egs_from_lattices
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    from kaldi_tpu.pipelines.chain import ChainTrainConfig, ChainTrainer
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    tm = TransitionModel(topo, tree)
    den = make_denominator_graph([[1, 2, 3], [3, 2, 1]], tree, topo)
    fwd_tid, self_tid = {}, {}
    for tid in range(1, tm.num_transition_ids + 1):
        ph = tm.transition_id_to_phone(tid)
        (self_tid if tm.is_self_loop(tid) else fwd_tid).setdefault(
            ph, tid)
    rng = np.random.default_rng(33)

    def lat_of(runs):
        ts = []
        for p, d in runs:
            ts.extend([fwd_tid[p]] + [self_tid[p]] * (d - 1))
        c = CompactLattice()
        s0, s1 = c.add_state(), c.add_state()
        c.start = s0
        c.arcs[s0].append(CompactArc(1, 0.0, 0.0, tuple(ts), s1))
        c.finals[s1] = (0.0, 0.0, ())
        return c

    runs = {"u0": [(1, 12), (2, 12), (3, 12)],
            "u1": [(3, 12), (2, 15), (1, 9)]}
    lattices = {u: lat_of(r) for u, r in runs.items()}
    feats = {u: rng.standard_normal(
        (sum(d for _, d in r) * 3, 5)).astype(np.float32)
        for u, r in runs.items()}
    egs = make_chain_egs_from_lattices(
        feats, lattices, tm, tree, topo, subsample=3, den=den,
        chunk_size=6)
    # 12 subsampled frames per utterance → 2 chunks each
    assert egs.feats.shape[0] == 4
    assert egs.mask.shape[1] == 6
    assert egs.sup["mid_start"].sum() == 2
    cfg = TdnnConfig(feat_dim=5, num_pdfs=tree.num_pdfs, hidden_dim=8,
                     bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    tr = ChainTrainer(cfg, den, ChainTrainConfig(
        num_epochs=8, batch_size=4, learning_rate=3e-3))
    out = tr.train(egs, log_every=1000)
    assert np.isfinite(out["loss"])


def test_fsa_numerator_gradient_finite_difference(pdf_maps):
    """∂logprob/∂scores from autodiff matches central finite
    differences (the nnet-derivative-test pattern); the gradient is a
    posterior: rows sum to ~1 over active frames."""
    import jax
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(21)
    T = 8
    paths = [[(1, 3), (2, 5)], [(1, 5), (3, 3)]]
    fsa = supervision_from_phone_runs(paths, [-0.2, -0.9], e_of, s_of, T)
    sup = pack_supervisions([fsa])
    scores = np.asarray(_scores(rng, 1, T, P))

    def f(s):
        return numerator_fsa_logprob(jnp.asarray(s), sup, tolerance=1)[0]

    g = np.asarray(jax.grad(lambda s: f(s))(jnp.asarray(scores)))
    # occupancy posteriors: each frame's gradient row sums to 1
    np.testing.assert_allclose(g[0].sum(axis=1), 1.0, atol=1e-4)
    eps = 1e-3
    for (t, p) in [(0, 1), (3, 2), (7, 0), (5, 4 % P)]:
        sp = scores.copy()
        sp[0, t, p] += eps
        sm = scores.copy()
        sm[0, t, p] -= eps
        fd = (float(f(sp)) - float(f(sm))) / (2 * eps)
        assert fd == pytest.approx(float(g[0, t, p]), abs=2e-3)


def test_normalization_weights_bound_numerator(pdf_maps):
    """With normalization weights composed in, the supervision paths
    are a weighted subset of the denominator's: num ≤ den for ANY
    scores (the AddWeightToSupervisionFst contract), and the weights
    change the numerator (they are actually applied)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.chain import (denominator_logprob,
                                    make_denominator_graph)
    from kaldi_tpu.am.chain_supervision import add_normalization_weights
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    den = make_denominator_graph(
        [[1, 2, 3], [3, 2, 1], [2, 1, 3], [1, 3, 2]], tree, topo,
        order=2)
    rng = np.random.default_rng(11)
    T = 10
    paths = [[(1, 3), (2, 4), (3, 3)], [(1, 4), (3, 3), (2, 3)]]
    raw = supervision_from_phone_runs(paths, [0.0, 0.0], e_of, s_of, T)
    norm = add_normalization_weights(raw, den)
    assert norm.self_w is not None and (norm.self_w < 0).all()
    sup_raw = pack_supervisions([raw])
    sup_norm = pack_supervisions([norm])
    for trial in range(5):
        scores = _scores(rng, 1, T, P)
        num = float(numerator_fsa_logprob(scores, sup_norm,
                                          tolerance=1)[0])
        d = float(denominator_logprob(den, scores,
                                      mask=jnp.ones((1, T), bool))[0])
        assert num <= d + 1e-3, f"trial {trial}: num {num} > den {d}"
        num_raw = float(numerator_fsa_logprob(scores, sup_raw,
                                              tolerance=1)[0])
        assert num < num_raw      # weights subtract mass


def test_chain_training_with_lattice_supervision(pdf_maps):
    """End-to-end: gradients flow through the FSA numerator and the
    LF-MMI objective improves."""
    import jax
    import optax
    from kaldi_tpu.am.chain import (denominator_logprob,
                                    make_denominator_graph)
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    den = make_denominator_graph([[1, 2, 3], [3, 2, 1]], tree, topo)
    rng = np.random.default_rng(6)
    T = 12
    paths = [[[(1, 4), (2, 4), (3, 4)], [(1, 6), (2, 3), (3, 3)]],
             [[(3, 4), (2, 4), (1, 4)]]]
    fsas = [supervision_from_phone_runs(
        ps, [0.0] * len(ps), e_of, s_of, T) for ps in paths]
    sup = pack_supervisions(fsas)
    feats = jnp.asarray(rng.standard_normal((2, T, 4)), jnp.float32)
    W = jnp.zeros((4, P), jnp.float32)
    mask = jnp.ones((2, T), bool)

    def loss_fn(W):
        scores = feats @ W
        num = numerator_fsa_logprob(scores, sup, tolerance=1)
        d = denominator_logprob(den, scores, mask=mask)
        return -(jnp.sum(num) - jnp.sum(d)) / (2 * T)

    tx = optax.adam(0.1)
    opt = tx.init(W)
    losses = []
    for _ in range(30):
        l, g = jax.value_and_grad(loss_fn)(W)
        up, opt = tx.update(g, opt, W)
        W = optax.apply_updates(W, up)
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1


def test_supervision_from_text_free_boundaries(pdf_maps):
    """e2e supervision (text only, no durations) at tolerance >= T
    equals brute-force logsumexp over every monotone alignment."""
    import itertools
    from kaldi_tpu.am.chain_supervision import supervision_from_text
    e_of, s_of, P = pdf_maps
    rng = np.random.default_rng(31)
    T = 8
    segs = [2, 1, 2]          # repeated phone is fine: distinct arcs
    fsa = supervision_from_text(segs, e_of, s_of, T)
    scores = _scores(rng, 1, T, P)
    got = np.asarray(numerator_fsa_logprob(
        scores, pack_supervisions([fsa]), tolerance=T))
    s = np.asarray(scores[0])
    vals = []
    for cut in itertools.combinations(range(1, T), len(segs) - 1):
        bounds = [0] + list(cut) + [T]
        tot = 0.0
        for k, ph in enumerate(segs):
            b, e = bounds[k], bounds[k + 1]
            tot += s[b, e_of(ph)] + sum(
                s[t, s_of(ph)] for t in range(b + 1, e))
        vals.append(tot)
    np.testing.assert_allclose(got[0], np.logaddexp.reduce(vals),
                               atol=1e-3)


def test_make_chain_egs_e2e_and_trainer(pdf_maps):
    """Flat-start end-to-end chain: egs built from TEXT only (no
    alignments, no lattices); training with free-boundary tolerance
    learns separable data."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.chain_supervision import make_chain_egs_e2e
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.pipelines.chain import ChainTrainConfig, ChainTrainer
    e_of, s_of, P = pdf_maps
    topo = HmmTopology.chain(PHONES)
    tree = MonophoneContextDependency(PHONES, topo)
    den = make_denominator_graph([[1, 2, 3], [3, 2, 1]], tree, topo)
    rng = np.random.default_rng(12)
    D = 5
    proto = {p: rng.standard_normal(D) for p in PHONES}
    texts = {"u0": [1, 2, 3], "u1": [3, 2, 1]}
    true_durs = {"u0": [9, 12, 9], "u1": [12, 9, 9]}
    feats = {}
    for u, seq in texts.items():
        fs = []
        for ph, dur in zip(seq, true_durs[u]):
            fs.extend([proto[ph] + 0.2 * rng.standard_normal(D)
                       for _ in range(dur)])
        feats[u] = np.asarray(fs, np.float32)
    egs = make_chain_egs_e2e(feats, texts, tree, topo, subsample=3,
                             den=den)
    assert egs.sup is not None
    T_sub = egs.mask.shape[1]
    cfg = TdnnConfig(feat_dim=D, num_pdfs=tree.num_pdfs, hidden_dim=12,
                     bottleneck_dim=6, num_layers=2,
                     frame_subsampling_factor=3)
    tr = ChainTrainer(cfg, den, ChainTrainConfig(
        num_epochs=30, batch_size=2, learning_rate=5e-3,
        supervision_tolerance=T_sub))   # free boundaries = e2e
    out = tr.train(egs, log_every=1000)
    assert np.isfinite(out["loss"])
    # normalized objf stays in the chain contract and the model
    # separates the classes: correct-phone pdfs beat wrong-phone ones
    scorer = tr.scores_fn()
    sc = np.asarray(scorer(feats["u0"][None]))[0]      # (T_sub, P)
    # middle of the first segment (frames 0..2 subsampled) is phone 1
    assert sc[1].argmax() in (e_of(1), s_of(1))
