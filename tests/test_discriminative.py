"""MMI/sMBR sequence training (am/discriminative.py — the nnet1
sMBR / nnet3 discriminative-training role) with brute-force path
oracles."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaldi_tpu.am.discriminative import (DenseLattice, den_occupancies,
                                         frame_accuracy, lattice_logz,
                                         lattice_to_dense, mmi_objf,
                                         smbr_objf)
from kaldi_tpu.lattice.lattice import Lattice, LatticeArc


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_confusion_lattice(T=4, npdf=3, width=2, rng=None, tid_to_pdf=None):
    """A time-synchronous sausage: `width` parallel arcs per frame with
    random pdfs and graph costs."""
    rng = rng or np.random.default_rng(1)
    lat = Lattice()
    states = [lat.add_state() for _ in range(T + 1)]
    lat.start = states[0]
    for t in range(T):
        for _ in range(width):
            pdf = int(rng.integers(npdf))
            gc = float(rng.uniform(0, 2))
            # ilabel = tid; tid_to_pdf is identity here
            lat.arcs[states[t]].append(
                LatticeArc(pdf + 1, 0, gc, 0.0, states[t + 1]))
    lat.set_final(states[T], 0.5, 0.0)
    return lat


def identity_tid_to_pdf(npdf):
    # tid 0 is ε/unused; tid k → pdf k-1
    return np.concatenate([[0], np.arange(npdf)]).astype(np.int32)


def brute_force_paths(lat, tid_to_pdf):
    """Enumerate all full paths: list of (pdfs per frame, graph logw)."""
    paths = []

    def walk(s, pdfs, w):
        if s in lat.finals:
            gc, ac = lat.finals[s]
            paths.append((list(pdfs), w - gc - ac))
        for a in lat.arcs[s]:
            walk(a.nextstate, pdfs + [int(tid_to_pdf[a.ilabel])],
                 w - a.graph_cost - a.acoustic_cost)

    walk(lat.start, [], 0.0)
    return paths


def test_logz_matches_brute_force(rng):
    T, P = 4, 3
    lat = make_confusion_lattice(T, P, width=2, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    scores = jnp.asarray(rng.standard_normal((T, P)), jnp.float32)
    kappa = 0.7
    got = float(lattice_logz(dense, scores, kappa))
    paths = brute_force_paths(lat, t2p)
    vals = [w + kappa * sum(float(scores[t, p]) for t, p in enumerate(pp))
            for pp, w in paths]
    want = float(jax.scipy.special.logsumexp(jnp.asarray(vals)))
    assert got == pytest.approx(want, abs=1e-4)


def test_occupancies_are_posteriors(rng):
    T, P = 3, 3
    lat = make_confusion_lattice(T, P, width=3, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    scores = jnp.asarray(rng.standard_normal((T, P)), jnp.float32)
    kappa = 1.0
    gamma = np.asarray(den_occupancies(dense, scores, kappa))
    # brute force posterior of pdf p at frame t
    paths = brute_force_paths(lat, t2p)
    vals = np.array([w + sum(float(scores[t, p])
                             for t, p in enumerate(pp))
                     for pp, w in paths])
    post = np.exp(vals - jax.scipy.special.logsumexp(jnp.asarray(vals)))
    want = np.zeros((T, P))
    for (pp, _), pr in zip(paths, post):
        for t, p in enumerate(pp):
            want[t, p] += pr
    np.testing.assert_allclose(gamma, want, atol=1e-4)
    # occupancies sum to 1 per frame
    np.testing.assert_allclose(gamma.sum(1), 1.0, atol=1e-4)


def test_smbr_matches_brute_force(rng):
    T, P = 4, 3
    lat = make_confusion_lattice(T, P, width=2, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    ref = rng.integers(0, P, T).astype(np.int32)
    acc = frame_accuracy(dense, ref)
    scores = jnp.asarray(rng.standard_normal((T, P)), jnp.float32)
    got = float(smbr_objf(dense, scores, jnp.asarray(acc), 1.0))
    paths = brute_force_paths(lat, t2p)
    vals = np.array([w + sum(float(scores[t, p])
                             for t, p in enumerate(pp))
                     for pp, w in paths])
    post = np.exp(vals - jax.scipy.special.logsumexp(jnp.asarray(vals)))
    accs = np.array([sum(1.0 for t, p in enumerate(pp) if p == ref[t])
                     for pp, _ in paths])
    want = float((post * accs).sum())
    assert got == pytest.approx(want, abs=1e-4)


def test_mmi_gradient_signs(rng):
    """MMI gradient = κ(1{num} − γ_den): positive on the numerator
    pdf, negative elsewhere (where the lattice has mass)."""
    T, P = 3, 3
    lat = make_confusion_lattice(T, P, width=3, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    scores = jnp.zeros((T, P))
    num = np.zeros(T, np.int32)
    g = jax.grad(lambda s: mmi_objf(dense, s, jnp.asarray(num), 1.0))(
        scores)
    g = np.asarray(g)
    gamma = np.asarray(den_occupancies(dense, scores, 1.0))
    np.testing.assert_allclose(
        g, (np.eye(P)[num] - gamma), atol=1e-4)


def test_mmi_ascent_improves_objective_and_accuracy(rng):
    """Gradient ascent on MMI over a linear scorer must push the
    best-path pdfs toward the numerator alignment."""
    T, P, D = 6, 4, 5
    lat = make_confusion_lattice(T, P, width=3, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    # numerator must be a den-lattice path (the reference guarantees
    # this by unioning num into den / boosting): pick one arc per frame
    num = np.array([int(t2p[lat.arcs[t][int(rng.integers(3))].ilabel])
                    for t in range(T)], np.int32)
    feats = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    W = jnp.zeros((D, P))

    def objf(W):
        return mmi_objf(dense, feats @ W, jnp.asarray(num), 1.0)

    g = jax.jit(jax.grad(objf))
    o0 = float(objf(W))
    for _ in range(100):
        W = W + 0.3 * g(W)
    o1 = float(objf(W))
    assert o1 > o0 + 0.5
    # bounded: logZ ≥ num-path total, so objf ≤ Σ graph costs + final
    # (costs are U[0,2] per frame, final 0.5) — no runaway
    assert o1 <= 2.0 * T + 0.5 + 1e-3


def test_smbr_ascent_raises_expected_accuracy(rng):
    T, P, D = 6, 4, 5
    lat = make_confusion_lattice(T, P, width=3, rng=rng)
    t2p = identity_tid_to_pdf(P)
    dense = lattice_to_dense(lat, t2p)
    ref = rng.integers(0, P, T).astype(np.int32)
    acc = jnp.asarray(frame_accuracy(dense, ref))
    feats = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    W = jnp.zeros((D, P))

    def objf(W):
        return smbr_objf(dense, feats @ W, acc, 1.0)

    g = jax.jit(jax.grad(objf))
    a0 = float(objf(W))
    for _ in range(150):
        W = W + 0.5 * g(W)
    a1 = float(objf(W))
    assert a1 > a0 + 0.2, (a0, a1)
    assert a1 <= T + 1e-3     # bounded by max frame accuracy


def test_dense_rejects_eps_arcs():
    lat = Lattice()
    s0, s1 = lat.add_state(), lat.add_state()
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(0, 0, 0.0, 0.0, s1))
    lat.set_final(s1)
    with pytest.raises(ValueError):
        lattice_to_dense(lat, identity_tid_to_pdf(2))


def test_eps_removal_preserves_path_sums(rng):
    """ε-removal: total path sum (logZ at fixed scores) unchanged."""
    # lattice with ε chains: frame arcs interleaved with ε arcs
    lat = Lattice()
    s = [lat.add_state() for _ in range(6)]
    lat.start = s[0]
    lat.arcs[s[0]].append(LatticeArc(1, 0, 0.3, 0.0, s[1]))
    lat.arcs[s[0]].append(LatticeArc(2, 0, 0.7, 0.0, s[2]))
    lat.arcs[s[2]].append(LatticeArc(0, 5, 0.2, 0.0, s[1]))  # ε
    lat.arcs[s[1]].append(LatticeArc(3, 0, 0.1, 0.0, s[3]))
    lat.arcs[s[3]].append(LatticeArc(0, 0, 0.4, 0.0, s[4]))  # ε
    lat.arcs[s[4]].append(LatticeArc(0, 0, 0.1, 0.0, s[5]))  # ε chain
    lat.set_final(s[3], 0.6, 0.0)
    lat.set_final(s[5], 0.2, 0.0)
    from kaldi_tpu.am.discriminative import remove_eps_arcs
    out = remove_eps_arcs(lat)
    assert all(a.ilabel != 0 for arcs in out.arcs for a in arcs)

    def eps_free_paths(l):
        """(pdf-seq skipping ε) → path weights."""
        d = {}

        def walk(s, pdfs, w):
            if s in l.finals:
                gc, ac = l.finals[s]
                d.setdefault(tuple(pdfs), []).append(w - gc - ac)
            for a in l.arcs[s]:
                nxt = pdfs + ([a.ilabel - 1] if a.ilabel else [])
                walk(a.nextstate, nxt, w - a.graph_cost - a.acoustic_cost)

        walk(l.start, [], 0.0)
        return d

    def seq_sums(l):
        return {k: float(jax.scipy.special.logsumexp(jnp.asarray(v)))
                for k, v in eps_free_paths(l).items()}

    got, want = seq_sums(out), seq_sums(lat)
    assert set(got) == set(want)
    for k in want:
        # ε-removal may merge parallel ε routes into one combined
        # final weight — only the per-sequence PATH SUM is invariant
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_den_lattice_from_real_decoder(rng):
    """End-to-end: real HCLG decode → ε-removal → dense FB; γ sums to
    1 per frame and MMI finetuning of a linear scorer improves."""
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.am.discriminative import den_lattice_from_decoder
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=1.0,
                                          lattice_beam=10.0))
    T, P = 24, tree.num_pdfs
    ll = rng.standard_normal((T, P)).astype(np.float32)
    dense = den_lattice_from_decoder(dec, ll)
    assert dense.T == T
    gamma = np.asarray(den_occupancies(dense, jnp.asarray(ll), 1.0))
    np.testing.assert_allclose(gamma.sum(1), 1.0, atol=1e-3)
    # MMI against the lattice best path as numerator
    raw, _ = dec.decode_lattice(ll)
    tids, _, _ = raw.best_path()
    num = tm.tid_to_pdf_array[np.asarray(tids)]
    obj = lambda s: mmi_objf(dense, s, jnp.asarray(num), 1.0)
    g = jax.jit(jax.grad(obj))
    s = jnp.asarray(ll)
    o0 = float(obj(s))
    for _ in range(30):
        s = s + 0.5 * g(s)
    assert float(obj(s)) > o0 + 0.5


def test_discriminative_finetune_pipeline(rng):
    """End-to-end sMBR fine-tune: xent TDNN → decode den lattices →
    sequence epochs raise the expected-accuracy objective."""
    from kaldi_tpu.am import (HmmTopology, MonophoneContextDependency,
                              TransitionModel)
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.pipelines.discriminative import (
        DiscriminativeConfig, discriminative_finetune)
    from kaldi_tpu.pipelines.nnet import XentTrainConfig, XentTrainer

    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    arpa = ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0}))
    HCLG = mkgraph(lang, tm, arpa_to_fst(arpa, lang.words))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=1e9, acoustic_scale=0.1,
                                          lattice_beam=8.0))
    P, D, T = tree.num_pdfs, 6, 36
    # reference alignments = valid decode paths of random score mats
    proto = rng.standard_normal((P, D)).astype(np.float32) * 2
    feats, alis = {}, {}
    for i in range(3):
        tids, _, _ = dec.decode(
            rng.standard_normal((T, P)).astype(np.float32))
        ref = tm.tid_to_pdf_array[np.asarray(tids)]
        alis[f"u{i}"] = ref.astype(np.int32)
        feats[f"u{i}"] = (proto[ref] + 1.0 * rng.standard_normal(
            (T, D))).astype(np.float32)
    cfg = TdnnConfig(feat_dim=D, num_pdfs=P, hidden_dim=16,
                     bottleneck_dim=8, num_layers=2,
                     frame_subsampling_factor=1)
    tr = XentTrainer(cfg, XentTrainConfig(num_epochs=6, chunk_size=12,
                                          batch_size=4,
                                          learning_rate=3e-3))
    tr.train(feats, alis)
    out = discriminative_finetune(
        tr, dec, feats, alis,
        DiscriminativeConfig(criterion="smbr", num_epochs=6,
                             learning_rate=3e-4, acoustic_scale=0.1))
    hist = out["objf"]
    assert np.isfinite(hist).all()
    assert hist[-1] > hist[0] + 0.01, hist
    # MMI variant runs too and improves
    tr2 = XentTrainer(cfg, XentTrainConfig(num_epochs=6, chunk_size=12,
                                           batch_size=4,
                                           learning_rate=3e-3))
    tr2.train(feats, alis)
    out2 = discriminative_finetune(
        tr2, dec, feats, alis,
        DiscriminativeConfig(criterion="mmi", num_epochs=6,
                             learning_rate=3e-4, acoustic_scale=0.1))
    assert out2["objf"][-1] > out2["objf"][0], out2["objf"]
