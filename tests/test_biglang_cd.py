"""Context-dependent (triphone) direct graph construction.

Oracle: the generic triphone mkgraph pipeline (compose_context +
make_h_transducer + determinize + minimize + add_self_loops), exactly
as test_beam_lattice.py uses the mono pipeline as oracle for the mono
fast path.  The exhaustive path-map equality is the strongest check:
both graphs must accept the SAME (tids, words) sequences at the SAME
min cost.
"""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, TransitionModel
from kaldi_tpu.am.tree import GaussStats, build_tree
from kaldi_tpu.pipelines.tri import cluster_phone_questions
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.fst import ArpaModel, Lang, Lexicon, arpa_to_fst, mkgraph
from kaldi_tpu.fst.arpa import estimate_arpa
from kaldi_tpu.fst.biglang import build_big_graph, eps_precompose
from kaldi_tpu.fst.csr import pack_fst

PHONES = ["AA", "B", "K", "D", "EH"]


def _lexicon(rng, n_words, max_len=3):
    out = []
    seen = set()
    for i in range(n_words):
        L = int(rng.integers(1, max_len + 1))
        pron = tuple(PHONES[int(k)] for k in rng.integers(0, len(PHONES), L))
        if pron in seen:
            continue
        seen.add(pron)
        out.append((f"W{i}", list(pron)))
    return sorted(out)


def _setup(rng, n_words, order=3, topo_kind="chain", leaves=40):
    entries = _lexicon(rng, n_words)
    ws = [w for w, _ in entries]
    texts = [[ws[int(k)] for k in rng.integers(0, len(ws),
                                               int(rng.integers(1, 6)))]
             for _ in range(200)]
    arpa = estimate_arpa(texts, order=order, prune_count=1, vocab=ws)
    lex = Lexicon(list(entries))
    lang = Lang(lex)
    pl = lang.phone_list()
    topo = (HmmTopology.chain(pl) if topo_kind == "chain"
            else HmmTopology.three_state(pl))
    npc = 1 if topo_kind == "chain" else 3
    # synthetic triphone stats with per-window signal so the tree splits
    # on left/right context
    stats = {}
    for ph in pl:
        for left in [0] + pl:
            for right in [0] + pl:
                for pc in range(npc):
                    g = GaussStats(3)
                    mean = np.array([ph, 0.31 * left + 0.17 * right,
                                     0.5 * pc])
                    for _ in range(4):
                        g.accumulate(mean + 0.05 * rng.standard_normal(3))
                    stats[((left, ph, right), pc)] = g
    questions = cluster_phone_questions(stats)
    tree = build_tree(stats, questions, 3, 1, max_leaves=leaves)
    assert tree.context_width == 3
    tm = TransitionModel(topo, tree)
    return entries, arpa, lang, tm, tree


def _all_paths(csr, T, tid_to_pdf, loglikes=None, scale=1.0, eps_bound=10):
    """Exhaustive (tids, words) → min cost over all length-T paths."""
    out = {}

    def go(state, t, depth, tids, words, cost):
        if t == T:
            f = csr.final_costs[state]
            if np.isfinite(f):
                key = (tuple(tids), tuple(words))
                c = cost + f
                if c < out.get(key, np.inf):
                    out[key] = c
        if depth < eps_bound:
            for i in range(csr.n_offsets[state], csr.n_offsets[state + 1]):
                go(int(csr.n_nextstate[i]), t, depth + 1, tids,
                   words + ([int(csr.n_olabel[i])]
                            if csr.n_olabel[i] else []),
                   cost + float(csr.n_weight[i]))
        if t < T:
            for i in range(csr.e_offsets[state], csr.e_offsets[state + 1]):
                il = int(csr.e_ilabel[i])
                ac = (0.0 if loglikes is None
                      else -scale * loglikes[t][tid_to_pdf[il]])
                go(int(csr.e_nextstate[i]), t + 1, 0, tids + [il],
                   words + ([int(csr.e_olabel[i])]
                            if csr.e_olabel[i] else []),
                   cost + float(csr.e_weight[i]) + ac)

    go(csr.start, 0, 0, [], [], 0.0)
    return out


@pytest.mark.parametrize("topo_kind", ["chain", "three_state"])
def test_cd_biglang_path_map_equals_mkgraph(topo_kind):
    """Tiny lexicon: the EXHAUSTIVE (tids, words) → min-cost path maps
    of the direct CD construction and the generic triphone mkgraph
    pipeline are identical for several utterance lengths."""
    rng = np.random.default_rng(7)
    entries, arpa, lang, tm, tree = _setup(rng, 3, order=2,
                                           topo_kind=topo_kind, leaves=25)
    csr_ref = pack_fst(mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                               self_loop_scale=1.0))
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    t2p = tm.tid_to_pdf_array
    Ts = [1, 2, 3, 4] if topo_kind == "chain" else [2, 4]
    for T in Ts:
        ref = _all_paths(csr_ref, T, t2p)
        got = _all_paths(big.csr, T, t2p)
        assert set(ref) == set(got), (
            f"T={T}: {len(ref)} ref vs {len(got)} cd paths; "
            f"only-ref={list(set(ref) - set(got))[:3]} "
            f"only-cd={list(set(got) - set(ref))[:3]}")
        for k, c in ref.items():
            assert abs(got[k] - c) < 1e-3, (T, k, c, got[k])


def test_cd_biglang_best_path_matches_mkgraph_trigram():
    """Mid lexicon, trigram LM: best decoded path (cost + words) agrees
    with the generic pipeline on random loglikes."""
    rng = np.random.default_rng(11)
    entries, arpa, lang, tm, tree = _setup(rng, 8, order=3,
                                           topo_kind="chain", leaves=40)
    csr_ref = pack_fst(mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                               self_loop_scale=1.0))
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    # exhaustive comparison: the arc budget must cover the FULL arc
    # table (the default auto-budget assumes beam pruning; with
    # beam=1e9 every state is active and budget-dropped arcs would
    # silently lose paths)
    cfg = BeamDecoderConfig(beam=1e9, max_active=10 ** 9,
                            acoustic_scale=1.0, arc_budget=1 << 15)
    d_ref = BeamDecoder(csr_ref, tm.tid_to_pdf_array, cfg)
    d_big = BeamDecoder(big.csr, tm.tid_to_pdf_array, cfg)
    for seed in range(4):
        r2 = np.random.default_rng(300 + seed)
        T = int(r2.integers(4, 12))
        ll = (r2.standard_normal((T, tree.num_pdfs)) * 2).astype(np.float32)
        t1, o1, c1 = d_ref.decode(ll)
        t2, o2, c2 = d_big.decode(ll)
        assert abs(c1 - c2) < 1e-3, (seed, c1, c2)
        assert o1 == o2


def test_cd_biglang_compact_lattice_olabel_seqs():
    """Lattices over the CD graph: sequence-encoded olabels (two words
    folded onto one composed arc by eps_precompose — 1-phone words)
    and start-closure olabels must expand back into plain word
    sequences through BOTH the fused native build+determinize path and
    the raw-lattice path, agreeing with the mkgraph oracle's lattice
    on best path and path set."""
    rng = np.random.default_rng(31)
    entries, arpa, lang, tm, tree = _setup(rng, 8, order=3,
                                           topo_kind="chain", leaves=40)
    assert any(len(p) == 1 for _, p in entries), "need a 1-phone word"
    csr_ref = pack_fst(mkgraph(lang, tm, arpa_to_fst(arpa, lang.words),
                               self_loop_scale=1.0))
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    from kaldi_tpu.fst.csr import OLSEQ_BASE
    pre = eps_precompose(big.csr)
    kw = dict(beam=1e9, max_active=10 ** 9, acoustic_scale=1.0,
              arc_budget=1 << 15, lattice_beam=4.0)
    d_ref = BeamDecoder(csr_ref, tm.tid_to_pdf_array, BeamDecoderConfig(
        lattice_arcs_per_frame=4 * csr_ref.num_states, **kw))
    d_big = BeamDecoder(big.csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        lattice_arcs_per_frame=4 * big.csr.num_states, **kw))
    saw_enc = (d_big.graph.e_olabel >= OLSEQ_BASE).any() or \
        (d_ref.graph.e_olabel >= OLSEQ_BASE).any()
    for seed in range(3):
        r2 = np.random.default_rng(700 + seed)
        T = int(r2.integers(4, 10))
        ll = (r2.standard_normal((T, tree.num_pdfs)) * 2).astype(np.float32)
        cl_ref = d_ref.decode_compact(ll, bucket=1)
        cl_big = d_big.decode_compact(ll, bucket=1)
        rw, rt, rc = cl_ref.best_path()
        gw, gt, gc = cl_big.best_path()
        assert gw == rw and abs(gc - rc) < 1e-3, (seed, rw, gw, rc, gc)
        # no encoded label may leak into the compact lattice
        assert all(x < OLSEQ_BASE for w, _ in cl_big.paths() for x in w)
        got = dict(cl_big.paths())
        want = dict(cl_ref.paths())
        for w in set(got) & set(want):
            assert abs(got[w] - want[w]) < 1e-3
        # raw-lattice path agrees with decode() on the best path
        t2, o2, c2 = d_big.decode(ll)
        lat = d_big.decode_lattice(ll)
        ltids, lwords, lc = lat.best_path()
        assert lwords == o2 and abs(lc - c2) < 1e-3
    assert saw_enc, "setup no longer exercises sequence-encoded olabels"


def test_cd_biglang_eps_precompose_equivalent():
    """The CD graph's ε arcs (chain ends, completions, backoff) fold
    away under eps_precompose without changing decodes."""
    rng = np.random.default_rng(23)
    entries, arpa, lang, tm, tree = _setup(rng, 8, order=2,
                                           topo_kind="chain", leaves=40)
    big = build_big_graph(entries, arpa, tm, lang.words, lang.phones,
                          self_loop_scale=1.0)
    pre = eps_precompose(big.csr)
    assert pre.num_eps_arcs == 0
    cfg = BeamDecoderConfig(beam=1e9, max_active=10 ** 9,
                            acoustic_scale=1.0, arc_budget=1 << 15)
    d1 = BeamDecoder(big.csr, tm.tid_to_pdf_array, cfg)
    d2 = BeamDecoder(pre, tm.tid_to_pdf_array, cfg)
    for seed in range(3):
        r2 = np.random.default_rng(500 + seed)
        T = int(r2.integers(4, 10))
        ll = (r2.standard_normal((T, tree.num_pdfs)) * 2).astype(np.float32)
        t1, o1, c1 = d1.decode(ll)
        t2, o2, c2 = d2.decode(ll)
        assert abs(c1 - c2) < 1e-3 and t1 == t2 and o1 == o2
