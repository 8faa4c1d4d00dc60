"""CLI bank 28: bin/fstbin/latbin/chainbin/rnnlmbin/kwsbin tails."""

import numpy as np
import pytest

from kaldi_tpu.am.gmm import AmDiagGmm
from kaldi_tpu.am.serialize import write_mdl
from kaldi_tpu.am.topology import HmmTopology
from kaldi_tpu.am.transitions import TransitionModel
from kaldi_tpu.am.tree import MonophoneContextDependency
from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter


@pytest.fixture
def rng():
    return np.random.default_rng(28)


def _lang_system(tmp_path, rng, D=3):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(D), np.ones(D),
                              perturb=0.3)
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    HCLG.write_text(str(tmp_path / "HCLG.txt"))
    return mdl, lang, tm, am


# ---------------------------------------------------------------------------
# bin tail


def test_align_equal_and_compare_int_vector(tmp_path, rng, capsys):
    # compile-train-graphs numbers phones from the lexicon file
    # (+ SIL): G, OW, N + SIL = 4 phones
    lex_path = str(tmp_path / "lexicon.txt")
    (tmp_path / "lexicon.txt").write_text("GO G OW\nNO N OW\n")
    phones = [1, 2, 3, 4]
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3),
                              perturb=0.3)
    mdl = str(tmp_path / "0.mdl")
    write_mdl(mdl, tm, am)
    T = 24
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u1"] = rng.standard_normal((T, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/t.ark", holder="text") as w:
        w["u1"] = ["GO"]
    assert main(["align-equal", lex_path, mdl, f"ark:{tmp_path}/f.ark",
                 f"ark:{tmp_path}/t.ark", f"ark:{tmp_path}/ali.ark"
                 ]) == 0
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u1"]
    assert len(ali) == T
    # compare-int-vector: identical → 0, differing → 1
    assert main(["compare-int-vector", f"ark:{tmp_path}/ali.ark",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    assert float(capsys.readouterr().out.strip()) == 0.0
    mod = np.asarray(ali).copy()
    mod[0] = mod[0] + 1
    with TableWriter(f"ark:{tmp_path}/ali2.ark", holder="ivec") as w:
        w["u1"] = mod.astype(np.int32)
    assert main(["compare-int-vector", f"ark:{tmp_path}/ali.ark",
                 f"ark:{tmp_path}/ali2.ark"]) == 1


def test_align_compiled_mapped_matches_gmm(tmp_path, rng):
    """Mapped alignment on GMM loglikes == gmm-align-compiled."""
    from kaldi_tpu.decoder.training_graph import TrainingGraphCompiler
    mdl, lang, tm, am = _lang_system(tmp_path, rng)
    compiler = TrainingGraphCompiler(lang, tm)
    with TableWriter(f"ark:{tmp_path}/gr.ark", holder="fst") as w:
        w["u1"] = compiler.compile_text(["NO"])
    T = 20
    feats = rng.standard_normal((T, 3)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/f.ark", holder="mat") as w:
        w["u1"] = feats
    ll = np.asarray(am.loglikes(feats)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        w["u1"] = ll
    assert main(["align-compiled-mapped", mdl, f"ark:{tmp_path}/gr.ark",
                 f"ark:{tmp_path}/ll.ark", f"ark:{tmp_path}/a1.ark"
                 ]) == 0
    assert main(["gmm-align-compiled", mdl, f"ark:{tmp_path}/gr.ark",
                 f"ark:{tmp_path}/f.ark", f"ark:{tmp_path}/a2.ark"
                 ]) == 0
    a1 = dict(SequentialTableReader(f"ark:{tmp_path}/a1.ark",
                                    holder="ivec"))["u1"]
    a2 = dict(SequentialTableReader(f"ark:{tmp_path}/a2.ark",
                                    holder="ivec"))["u1"]
    np.testing.assert_array_equal(a1, a2)


def test_prons_to_wordali(tmp_path):
    # prons: word 7 = phones (1 2), word 9 = phone (3)
    with TableWriter(f"ark:{tmp_path}/prons.ark", holder="text") as w:
        w["u"] = "7 1 2 ; 9 3".split()
    with TableWriter(f"ark:{tmp_path}/len.ark", holder="text") as w:
        w["u"] = "1 4 ; 2 6 ; 3 5".split()
    assert main(["prons-to-wordali", f"ark:{tmp_path}/prons.ark",
                 f"ark:{tmp_path}/len.ark",
                 f"ark:{tmp_path}/wa.ark"]) == 0
    wa = dict(SequentialTableReader(f"ark:{tmp_path}/wa.ark",
                                    holder="text"))["u"]
    assert list(wa) == ["7", "10", "9", "5"]


def test_make_ilabel_transducer(tmp_path):
    (tmp_path / "old.info").write_text(
        "\n0\n1 2 3\n1 2 3\n2 3 4\n")           # ids 0..4; 2&3 dup
    assert main(["make-ilabel-transducer", str(tmp_path / "old.info"),
                 str(tmp_path / "new.info"),
                 str(tmp_path / "map.fst")]) == 0
    new_info = (tmp_path / "new.info").read_text().splitlines()
    assert len(new_info) == 4                   # dup collapsed
    from kaldi_tpu.cli.tools_extra import _load_fst
    m = _load_fst(str(tmp_path / "map.fst"))
    pairs = {(a.olabel, a.ilabel) for a in m.arcs[m.start]}
    assert (2, 2) in pairs and (3, 2) in pairs  # both olds → new id 2


def test_latgen_incremental_mapped_matches_offline(tmp_path, rng):
    mdl, lang, tm, am = _lang_system(tmp_path, rng)
    T = 40
    feats = rng.standard_normal((T, 3)).astype(np.float32)
    ll = np.asarray(am.loglikes(feats)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/ll.ark", holder="mat") as w:
        w["u1"] = ll
    assert main(["latgen-incremental-mapped", "--chunk-frames=16",
                 mdl, str(tmp_path / "HCLG.txt"),
                 f"ark:{tmp_path}/ll.ark",
                 f"ark:{tmp_path}/inc.lats"]) == 0
    assert main(["latgen-faster-mapped", mdl,
                 str(tmp_path / "HCLG.txt"), f"ark:{tmp_path}/ll.ark",
                 f"ark:{tmp_path}/off.lats"]) == 0
    inc = dict(SequentialTableReader(f"ark:{tmp_path}/inc.lats",
                                     holder="clat"))["u1"]
    off = dict(SequentialTableReader(f"ark:{tmp_path}/off.lats",
                                     holder="clat"))["u1"]
    iw, _it, ic = inc.best_path()
    ow, _ot, oc = off.best_path()
    assert iw == ow
    assert ic == pytest.approx(oc, abs=0.1)


# ---------------------------------------------------------------------------
# fstbin tail


def test_fstmakecontextfst_triphone_windows(tmp_path):
    """C ∘ (phone string acceptor) yields the expected triphone
    window sequence on the input side."""
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst.fst import VectorFst, Arc
    from kaldi_tpu.fst.ops import compose, shortest_path
    (tmp_path / "phones.txt").write_text("1 2 3\n")
    assert main(["fstmakecontextfst", "--context-width=3",
                 "--central-position=1", str(tmp_path / "phones.txt"),
                 str(tmp_path / "ilabels"),
                 str(tmp_path / "C.fst")]) == 0
    C = _load_fst(str(tmp_path / "C.fst"))
    with open(tmp_path / "ilabels") as f:
        infos = [tuple(int(x) for x in line.split()) for line in f]
    # linear acceptor for phones 1 2 3
    F = VectorFst()
    s = [F.add_state() for _ in range(4)]
    F.start = s[0]
    for i, p in enumerate((1, 2, 3)):
        F.add_arc(s[i], Arc(p, p, 0.0, s[i + 1]))
    F.set_final(s[3], 0.0)
    CF = compose(C, F)
    arcs, cost = shortest_path(CF)
    windows = [infos[a.ilabel] for a in arcs if a.ilabel]
    assert windows == [(0, 1, 2), (1, 2, 3), (2, 3, 0)]
    assert cost == pytest.approx(0.0)
    # single-phone utterance
    F1 = VectorFst()
    a, b = F1.add_state(), F1.add_state()
    F1.start = a
    F1.add_arc(a, Arc(2, 2, 0.0, b))
    F1.set_final(b, 0.0)
    arcs1, _ = shortest_path(compose(C, F1))
    assert [infos[x.ilabel] for x in arcs1 if x.ilabel] == [(0, 2, 0)]


def test_fstmakecontextsyms(tmp_path):
    from kaldi_tpu.fst.fst import SymbolTable
    tab = SymbolTable()
    tab.add("<eps>")
    tab.add("a")
    tab.add("b")
    tab.write(str(tmp_path / "phones.sym"))
    (tmp_path / "info").write_text("\n1 2 1\n")
    assert main(["fstmakecontextsyms", str(tmp_path / "phones.sym"),
                 str(tmp_path / "info"),
                 str(tmp_path / "csyms")]) == 0
    text = (tmp_path / "csyms").read_text()
    assert "<eps> 0" in text and "a/b/a 1" in text


def test_fstrand_determinize_equivalent(tmp_path):
    """fstrand fixtures feed the determinize-star property test."""
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst.ops import (determinize_star, rand_equivalent,
                                   rm_epsilon)
    for seed in (0, 1, 2):
        assert main(["fstrand", f"--seed={seed}", "--acceptor=true",
                     "--num-states=6", "--num-arcs=12",
                     str(tmp_path / "r.fst")]) == 0
        fst = _load_fst(str(tmp_path / "r.fst"))
        det = determinize_star(fst)
        assert rand_equivalent(rm_epsilon(fst), det, num_paths=20,
                               seed=seed)


# ---------------------------------------------------------------------------
# latbin tail


def test_lattice_expand_unique_histories(tmp_path):
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    from kaldi_tpu.lattice.ops import (enumerate_paths,
                                       lattices_equivalent)
    # diamond: two histories converge on state 3
    c = CompactLattice()
    s = [c.add_state() for _ in range(3)]
    c.start = s[0]
    c.arcs[s[0]].append(CompactArc(7, 1.0, 0.0, (1,), s[1]))
    c.arcs[s[0]].append(CompactArc(8, 2.0, 0.0, (2,), s[1]))
    c.arcs[s[1]].append(CompactArc(9, 0.5, 0.0, (3,), s[2]))
    c.finals[s[2]] = (0.0, 0.0, ())
    with TableWriter(f"ark:{tmp_path}/in.lats", holder="clat") as w:
        w["u"] = c
    assert main(["lattice-expand", "--lm-order=2",
                 f"ark:{tmp_path}/in.lats",
                 f"ark:{tmp_path}/out.lats"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/out.lats",
                                     holder="clat"))["u"]
    assert lattices_equivalent(c, out)
    # state 1 split into (1, hist=7) and (1, hist=8)
    assert len(out.arcs) == len(c.arcs) + 1
    # every state has a unique 1-word in-history
    in_hist = {}
    for st in range(len(out.arcs)):
        for a in out.arcs[st]:
            in_hist.setdefault(a.nextstate, set()).add(a.word or None)
    for st, hists in in_hist.items():
        real = {h for h in hists if h is not None}
        assert len(real) <= 1


# ---------------------------------------------------------------------------
# chainbin tail


def test_chain_get_supervision(tmp_path, rng):
    from kaldi_tpu.am.chain_supervision import numerator_fsa_logprob
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "chain.mdl")
    write_mdl(mdl, tm, am)
    # a valid alignment: phone 1 for 6 frames, phone 2 for 6
    tids = []
    for phone, dur in ((1, 6), (2, 6)):
        st = topo.topology_for_phone(phone)[0]
        ts = tm.tuple_to_transition_state(
            phone, 0, tree.compute([phone], st.forward_pdf_class),
            tree.compute([phone], st.self_loop_pdf_class))
        first = tm.pair_to_transition_id(ts, 0)
        self_loop = tm.self_loop_of(ts)
        # chain topology: the self-loop may be transition index 1
        if self_loop == first:
            self_loop = tm.pair_to_transition_id(ts, 1)
        tids += [first] + [self_loop] * (dur - 1)
    with TableWriter(f"ark:{tmp_path}/ali.ark", holder="ivec") as w:
        w["u"] = np.asarray(tids, np.int32)
    assert main(["chain-get-supervision",
                 "--frame-subsampling-factor=3", mdl,
                 f"ark:{tmp_path}/ali.ark",
                 f"ark:{tmp_path}/sup.ark"]) == 0
    entries = dict(SequentialTableReader(f"ark:{tmp_path}/sup.ark",
                                         holder="ceg"))
    fsa = entries["u"].fsa
    assert fsa is not None
    assert fsa.num_frames == 4                  # 12 frames / 3
    assert len(fsa.src) == 2                    # one arc per phone


def test_chain_make_num_fst_e2e(tmp_path, rng):
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "chain.mdl")
    write_mdl(mdl, tm, am)
    with TableWriter(f"ark:{tmp_path}/tr.ark", holder="ivec") as w:
        w["u"] = np.asarray([1, 2, 1], np.int32)
    with TableWriter(f"ark:{tmp_path}/nf.ark", holder="ivec") as w:
        w["u"] = np.asarray([30], np.int32)
    assert main(["chain-make-num-fst-e2e", mdl, f"ark:{tmp_path}/tr.ark",
                 f"ark:{tmp_path}/nf.ark", f"ark:{tmp_path}/sup.ark"
                 ]) == 0
    fsa = dict(SequentialTableReader(f"ark:{tmp_path}/sup.ark",
                                     holder="ceg"))["u"].fsa
    assert fsa.num_frames == 10 and len(fsa.src) == 3


def test_chain_make_den_fst_alias(tmp_path, rng):
    phones = [1, 2]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(3), np.ones(3))
    mdl = str(tmp_path / "chain.mdl")
    write_mdl(mdl, tm, am)
    with TableWriter(f"ark:{tmp_path}/seqs.ark", holder="ivec") as w:
        for i in range(4):
            w[f"u{i}"] = rng.integers(1, 3, 8).astype(np.int32)
    assert main(["chain-make-den-fst", mdl, f"ark:{tmp_path}/seqs.ark",
                 str(tmp_path / "den")]) == 0
    from kaldi_tpu.am.chain import read_denominator_graph
    from kaldi_tpu.core import io as kio
    with kio.open_rxfilename(str(tmp_path / "den")) as f:
        kio.init_kaldi_input_stream(f)
        den = read_denominator_graph(f)
    assert den.num_states > 0


# ---------------------------------------------------------------------------
# rnnlmbin + kwsbin tails


def test_rnnlm_get_sampling_lm(tmp_path, rng):
    from kaldi_tpu.cli.tools_bank28 import read_sampling_lm
    with TableWriter(f"ark:{tmp_path}/text.ark", holder="ivec") as w:
        for i in range(10):
            w[f"s{i}"] = rng.integers(0, 20, 12).astype(np.int32)
    assert main(["rnnlm-get-sampling-lm", "--vocab-size=25",
                 f"ark:{tmp_path}/text.ark",
                 str(tmp_path / "sampling.lm")]) == 0
    probs = read_sampling_lm(str(tmp_path / "sampling.lm"))
    assert probs.shape == (25,)
    assert probs.sum() == pytest.approx(1.0, abs=1e-5)
    assert (probs > 0).all()                    # smoothed


def test_compute_atwv(tmp_path, capsys):
    # refs: kw1 ×2, kw2 ×1
    with TableWriter(f"ark:{tmp_path}/ref.ark", holder="text") as w:
        w["kw1-1"] = ["uA", "100", "120"]
        w["kw1-2"] = ["uB", "300", "330"]
        w["kw2-1"] = ["uA", "500", "540"]
    # hyps: kw1 hits both, kw2 misses + one false alarm
    with TableWriter(f"ark:{tmp_path}/hyp.ark", holder="text") as w:
        w["kw1-1"] = ["uA", "102", "118", "0.9"]
        w["kw1-2"] = ["uB", "305", "325", "0.8"]
        w["kw2-1"] = ["uB", "700", "740", "0.4"]
    assert main(["compute-atwv", "--print-per-keyword=true", "360000",
                 f"ark:{tmp_path}/ref.ark",
                 f"ark:{tmp_path}/hyp.ark"]) == 0
    atwv = float(capsys.readouterr().out.strip())
    # kw1 perfect (twv 1), kw2: miss + 1 FA over ~3599 trials
    expected_kw2 = 1.0 - 1.0 - 999.9 * (1.0 / (3600.0 - 1.0))
    assert atwv == pytest.approx((1.0 + expected_kw2) / 2, abs=1e-3)
    # perfect results → ATWV 1.0
    assert main(["compute-atwv", "360000", f"ark:{tmp_path}/ref.ark",
                 f"ark:{tmp_path}/ref.ark"]) == 0
    assert float(capsys.readouterr().out.strip()) == pytest.approx(1.0)
