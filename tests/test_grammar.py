"""Grammar FST (nonterminal replacement) tests.

Oracle: an inlined graph built directly with the sub-grammar's paths
substituted at the call site must decode identically (same best path,
words, cost) to the spliced grammar graph, on random scores."""

import numpy as np
import pytest

from kaldi_tpu.am import HmmTopology, MonophoneContextDependency, \
    TransitionModel
from kaldi_tpu.decoder.beam import BeamDecoder, BeamDecoderConfig
from kaldi_tpu.fst.csr import pack_fst
from kaldi_tpu.fst.fst import Arc, VectorFst
from kaldi_tpu.fst.grammar import GrammarGraph, replace_nonterminals

NT_CONTACT = 9000


@pytest.fixture(scope="module")
def tmodel():
    phones = [1, 2, 3, 4]
    topo = HmmTopology.chain(phones)
    tree = MonophoneContextDependency(phones, topo)
    return TransitionModel(topo, tree), topo, tree


def _tids(tm, topo, tree, phone):
    st = topo.topology_for_phone(phone)[0]
    window = [phone]
    fwd = tree.compute(window, st.forward_pdf_class)
    slf = tree.compute(window, st.self_loop_pdf_class)
    ts = tm.tuple_to_transition_state(phone, 0, fwd, slf)
    fwd_tid = [tm.pair_to_transition_id(ts, i)
               for i, (ns, _) in enumerate(st.transitions) if ns != 0][0]
    return fwd_tid, tm.self_loop_of(ts)


def _word_graph(tm, topo, tree, words):
    """Word-loop graph over tid chains with self-loops: each entry is
    (word_id, [phones])."""
    fst = VectorFst()
    loop = fst.add_state()
    fst.set_start(loop)
    fst.set_final(loop, 0.0)
    for wid, phones in words:
        cur = loop
        for i, p in enumerate(phones):
            fwd, slf = _tids(tm, topo, tree, p)
            nxt = fst.add_state() if i < len(phones) - 1 else loop
            fst.add_arc(cur, Arc(fwd, wid if i == 0 else 0, 0.5, nxt))
            fst.add_arc(nxt, Arc(slf, 0, 0.1, nxt))
            cur = nxt
    return fst


def _linear_graph(tm, topo, tree, items):
    """Linear graph: items are phones (int) or ('NT', symbol) or
    ('WORD', wid, [phones])."""
    fst = VectorFst()
    cur = fst.add_state()
    fst.set_start(cur)
    for item in items:
        if isinstance(item, tuple) and item[0] == "NT":
            nxt = fst.add_state()
            fst.add_arc(cur, Arc(item[1], 0, 0.25, nxt))
            cur = nxt
            continue
        _, wid, phones = item
        for i, p in enumerate(phones):
            fwd, slf = _tids(tm, topo, tree, p)
            nxt = fst.add_state()
            fst.add_arc(cur, Arc(fwd, wid if i == 0 else 0, 0.5, nxt))
            fst.add_arc(nxt, Arc(slf, 0, 0.1, nxt))
            cur = nxt
    fst.set_final(cur, 0.0)
    return fst


CALL = ("WORD", 10, [1, 2])
NOW = ("WORD", 11, [2, 1])
ALICE = (20, [3, 4])
BOB = (21, [4, 3])
CAROL = (22, [3, 3, 4])


def _decode(csr, tm, ll):
    dec = BeamDecoder(csr, tm.tid_to_pdf_array, BeamDecoderConfig(
        beam=1e9, max_active=csr.num_states, acoustic_scale=1.0))
    return dec.decode(ll)


@pytest.mark.parametrize("seed", range(3))
def test_grammar_matches_inlined(tmodel, seed):
    tm, topo, tree = tmodel
    base = pack_fst(_linear_graph(tm, topo, tree,
                                  [CALL, ("NT", NT_CONTACT), NOW]))
    sub = pack_fst(_word_graph(tm, topo, tree, [ALICE, BOB]))
    spliced = replace_nonterminals(base, {NT_CONTACT: sub})

    rng = np.random.default_rng(seed)
    ll = rng.standard_normal((12, tree.num_pdfs)).astype(np.float32)
    got = _decode(spliced, tm, ll)

    # oracle: inline the contact loop at the call site, object level
    inl = _linear_graph(tm, topo, tree, [CALL])
    call_end = max(inl.finals)
    inl.finals.clear()
    loop_off = inl.num_states
    contact_loop = _word_graph(tm, topo, tree, [ALICE, BOB])
    for _ in range(contact_loop.num_states):
        inl.add_state()
    for s in range(contact_loop.num_states):
        for a in contact_loop.arcs[s]:
            inl.add_arc(loop_off + s, Arc(a.ilabel, a.olabel, a.weight,
                                          loop_off + a.nextstate))
    inl.add_arc(call_end, Arc(0, 0, 0.25, loop_off + contact_loop.start))
    tail = _linear_graph(tm, topo, tree, [NOW])
    tail_off = inl.num_states
    for _ in range(tail.num_states):
        inl.add_state()
    for s in range(tail.num_states):
        for a in tail.arcs[s]:
            inl.add_arc(tail_off + s, Arc(a.ilabel, a.olabel, a.weight,
                                          tail_off + a.nextstate))
    for s, w in contact_loop.finals.items():
        inl.add_arc(loop_off + s, Arc(0, 0, w, tail_off + tail.start))
    for s, w in tail.finals.items():
        inl.set_final(tail_off + s, w)
    ref = _decode(pack_fst(inl), tm, ll)

    assert abs(got[2] - ref[2]) < 1e-3
    assert got[0] == ref[0]       # tid alignment
    assert got[1] == ref[1]       # words


def test_grammar_swap(tmodel):
    """Swapping the sub-grammar changes what's decodable — without
    touching the base graph."""
    tm, topo, tree = tmodel
    base = pack_fst(_linear_graph(tm, topo, tree,
                                  [CALL, ("NT", NT_CONTACT), NOW]))
    g = GrammarGraph(base, {NT_CONTACT: pack_fst(
        _word_graph(tm, topo, tree, [ALICE]))})

    # synthesize scores for "CALL CAROL NOW"
    def score_for(phones):
        fwd_slf = [_tids(tm, topo, tree, p) for p in phones]
        pdfs = []
        for fwd, slf in fwd_slf:
            pdfs.append(tm.transition_id_to_pdf(fwd))
            pdfs.append(tm.transition_id_to_pdf(slf))
        T = len(pdfs)
        ll = np.full((T, tree.num_pdfs), -8.0, np.float32)
        ll[np.arange(T), pdfs] = 0.0
        return ll

    ll = score_for([1, 2] + list(CAROL[1]) + [2, 1])
    dec1 = _decode(g.expanded, tm, ll)
    assert CAROL[0] not in dec1[1]        # CAROL not in grammar yet

    g.swap_sub(NT_CONTACT, pack_fst(
        _word_graph(tm, topo, tree, [ALICE, CAROL])))
    dec2 = _decode(g.expanded, tm, ll)
    assert dec2[1] == [10, 22, 11]        # CALL CAROL NOW
    assert dec2[2] < dec1[2]
