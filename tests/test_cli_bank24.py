"""CLI bank 24: online2 TCP server, fstbin utility tail, grammar FST,
kws proxies."""

import math
import socket
import threading
import time

import numpy as np
import pytest

from kaldi_tpu.cli import TOOLS, main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.fst.fst import Arc, VectorFst


@pytest.fixture
def rng():
    return np.random.default_rng(24)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_online2_tcp_server(tmp_path, rng):
    """Real socket round-trip: PCM in, '\\r' partials + '\\n' final
    out, and the final equals the offline streaming tool's output on
    the same audio."""
    import jax
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.serialize import write_mdl
    from kaldi_tpu.am.tdnn import TdnnChain, TdnnConfig
    from kaldi_tpu.am.topology import HmmTopology
    from kaldi_tpu.am.transitions import TransitionModel
    from kaldi_tpu.am.tree import MonophoneContextDependency
    from kaldi_tpu.fst import (ArpaModel, Lang, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    from kaldi_tpu.fst.lang import Lexicon
    lex = Lexicon([("A", ["a"]), ("B", ["b"])])
    lang = Lang(lex)
    topo = HmmTopology.chain(lang.phone_list())
    tree = MonophoneContextDependency(lang.phone_list(), topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(13), np.ones(13))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    cfg = TdnnConfig(feat_dim=13, num_pdfs=tree.num_pdfs,
                     hidden_dim=16, bottleneck_dim=4, num_layers=2,
                     frame_subsampling_factor=3)
    net = TdnnChain(cfg)
    v = net.init(jax.random.PRNGKey(0),
                 np.zeros((1, 30, 13), np.float32), train=False)
    raw = str(tmp_path / "final.raw")
    write_raw_model(raw, v["params"], v["batch_stats"], cfg)
    HCLG = mkgraph(lang, tm, arpa_to_fst(ArpaModel.parse(
        make_unigram_arpa({"A": 1.0, "B": 1.0})), lang.words),
        self_loop_scale=1.0)
    fst_txt = str(tmp_path / "HCLG.txt")
    HCLG.write_text(fst_txt)
    words_txt = str(tmp_path / "words.txt")
    lang.words.write(words_txt)
    wave_f = 0.1 * rng.standard_normal(16000).astype(np.float32)
    pcm = (wave_f * 32768.0).astype(np.int16)

    # offline reference through the file-based streaming tool
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["u"] = (pcm.astype(np.float32), 16000)
    assert TOOLS["online2-wav-nnet3-latgen-faster"](
        ["--chunk-length=0.2", f"--word-symbol-table={words_txt}",
         mdl, raw, fst_txt, f"ark:{tmp_path}/wav.ark",
         f"ark,t:{tmp_path}/ref.txt"]) == 0
    ref = dict(SequentialTableReader(f"ark,t:{tmp_path}/ref.txt",
                                     holder="text"))["u"]

    port = _free_port()
    th = threading.Thread(target=main, args=([
        "online2-tcp-nnet3-decode-faster", f"--port-num={port}",
        "--max-connections=1", "--chunk-length=0.2",
        "--read-timeout=5", mdl, raw, fst_txt, words_txt],),
        daemon=True)
    th.start()
    deadline = time.time() + 30
    sock = None
    while time.time() < deadline:
        try:
            sock = socket.create_connection(("127.0.0.1", port),
                                            timeout=2)
            break
        except OSError:
            time.sleep(0.2)
    assert sock is not None, "server never came up"
    data = pcm.tobytes()
    for i in range(0, len(data), 6400):
        sock.sendall(data[i:i + 6400])
        time.sleep(0.01)
    sock.shutdown(socket.SHUT_WR)
    sock.settimeout(60)
    got = b""
    while b"\n" not in got:
        chunk = sock.recv(4096)
        if not chunk:
            break
        got += chunk
    sock.close()
    th.join(timeout=30)
    assert b"\n" in got
    final = got.split(b"\n")[0].split(b"\r")[-1].decode().split()
    assert final == ref       # same hypothesis as the offline tool


def test_extend_wav_with_silence(tmp_path, rng):
    rate = 8000
    wave = (1000 * rng.standard_normal(rate)).astype(np.int16)
    wave[4000:4200] = 5     # quietest window
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        w["u"] = (wave, rate)
    assert main(["extend-wav-with-silence",
                 "--extra-silence-length=0.5",
                 f"ark:{tmp_path}/w.ark", f"ark:{tmp_path}/o.ark"]) == 0
    out, orate = dict(SequentialTableReader(
        f"ark:{tmp_path}/o.ark", holder="wav"))["u"]
    assert orate == rate
    assert len(out) == len(wave) + rate // 2
    # appended tail is low-energy
    assert np.abs(out[len(wave):]).mean() < np.abs(wave).mean() * 0.1


def test_ivector_randomize(tmp_path, rng):
    m = np.arange(40, dtype=np.float32).reshape(10, 4)
    with TableWriter(f"ark:{tmp_path}/iv.ark", holder="mat") as w:
        w["u"] = m
    assert main(["ivector-randomize", "--randomize-prob=1.0",
                 "--srand=1", f"ark:{tmp_path}/iv.ark",
                 f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u"]
    assert out.shape == m.shape
    assert not np.allclose(out, m)          # rows were replaced
    # every row is SOME original prefix row
    rows = {tuple(r) for r in m}
    assert all(tuple(r) in rows for r in out)
    # prob 0 → unchanged
    assert main(["ivector-randomize", "--randomize-prob=0.0",
                 f"ark:{tmp_path}/iv.ark", f"ark:{tmp_path}/o0.ark"]) == 0
    np.testing.assert_allclose(dict(SequentialTableReader(
        f"ark:{tmp_path}/o0.ark", holder="mat"))["u"], m)


def _write_fst(path, f):
    from kaldi_tpu.fst.openfst_io import write_fst_path
    write_fst_path(str(path), f)


def test_fstdeterminizelog(tmp_path):
    """Two parallel paths with the same labels merge with LOG-ADDED
    weight (probability mass preserved), not min."""
    f = VectorFst()
    s = [f.add_state() for _ in range(3)]
    f.start = s[0]
    f.add_arc(s[0], Arc(1, 1, 1.0, s[1]))
    f.add_arc(s[0], Arc(1, 1, 2.0, s[2]))
    f.set_final(s[1], 0.0)
    f.set_final(s[2], 0.0)
    _write_fst(tmp_path / "f.fst", f)
    assert main(["fstdeterminizelog", str(tmp_path / "f.fst"),
                 str(tmp_path / "d.fst")]) == 0
    from kaldi_tpu.fst.openfst_io import read_fst_path
    d = read_fst_path(str(tmp_path / "d.fst"))
    arcs = [a for st in range(d.num_states) for a in d.arcs[st]]
    assert len(arcs) == 1
    want = -math.log(math.exp(-1.0) + math.exp(-2.0))
    total = arcs[0].weight + d.final(arcs[0].nextstate)
    assert total == pytest.approx(want, abs=1e-5)


def test_fstpropfinal(tmp_path):
    phi = 99
    f = VectorFst()
    s = [f.add_state() for _ in range(3)]
    f.start = s[0]
    f.add_arc(s[0], Arc(phi, 0, 0.5, s[1]))
    f.add_arc(s[1], Arc(phi, 0, 0.25, s[2]))
    f.set_final(s[2], 1.0)
    _write_fst(tmp_path / "f.fst", f)
    assert main(["fstpropfinal", str(phi), str(tmp_path / "f.fst"),
                 str(tmp_path / "p.fst")]) == 0
    from kaldi_tpu.fst.openfst_io import read_fst_path
    p = read_fst_path(str(tmp_path / "p.fst"))
    assert p.final(1) == pytest.approx(1.25)
    assert p.final(0) == pytest.approx(1.75)


def test_fstrhocompose(tmp_path):
    rho = 99
    # fst1: emits labels 1 then 2
    f1 = VectorFst()
    a = [f1.add_state() for _ in range(3)]
    f1.start = a[0]
    f1.add_arc(a[0], Arc(1, 1, 0.0, a[1]))
    f1.add_arc(a[1], Arc(2, 2, 0.0, a[2]))
    f1.set_final(a[2], 0.0)
    # fst2: explicit arc for 1 (cost 0.1), rho for everything else
    # (cost 0.7)
    f2 = VectorFst()
    b = [f2.add_state() for _ in range(2)]
    f2.start = b[0]
    f2.add_arc(b[0], Arc(1, 1, 0.1, b[1]))
    f2.add_arc(b[0], Arc(rho, rho, 0.7, b[0]))
    f2.add_arc(b[1], Arc(rho, rho, 0.7, b[1]))
    f2.set_final(b[0], 0.0)
    f2.set_final(b[1], 0.0)
    _write_fst(tmp_path / "a.fst", f1)
    _write_fst(tmp_path / "b.fst", f2)
    assert main(["fstrhocompose", str(rho), str(tmp_path / "a.fst"),
                 str(tmp_path / "b.fst"), str(tmp_path / "c.fst")]) == 0
    from kaldi_tpu.fst.openfst_io import read_fst_path
    from kaldi_tpu.fst.ops import shortest_path
    c = read_fst_path(str(tmp_path / "c.fst"))
    arcs, cost = shortest_path(c)
    assert [x.olabel for x in arcs if x.olabel] == [1, 2]
    assert cost == pytest.approx(0.1 + 0.7)   # 1 matched, 2 via rho


def test_fsts_concat_union_project(tmp_path):
    f1 = VectorFst()
    s = [f1.add_state() for _ in range(2)]
    f1.start = s[0]
    f1.add_arc(s[0], Arc(1, 11, 0.5, s[1]))
    f1.set_final(s[1], 0.25)
    f2 = VectorFst()
    t = [f2.add_state() for _ in range(2)]
    f2.start = t[0]
    f2.add_arc(t[0], Arc(2, 22, 0.5, t[1]))
    f2.set_final(t[1], 0.0)
    with TableWriter(f"ark:{tmp_path}/x.ark", holder="fst") as w:
        w["u"] = f1
    with TableWriter(f"ark:{tmp_path}/y.ark", holder="fst") as w:
        w["u"] = f2
    from kaldi_tpu.fst.ops import shortest_path
    assert main(["fsts-concat", f"ark:{tmp_path}/x.ark",
                 f"ark:{tmp_path}/y.ark", f"ark:{tmp_path}/c.ark"]) == 0
    c = dict(SequentialTableReader(f"ark:{tmp_path}/c.ark",
                                   holder="fst"))["u"]
    arcs, cost = shortest_path(c)
    assert [a.ilabel for a in arcs if a.ilabel] == [1, 2]
    assert cost == pytest.approx(1.25)
    assert main(["fsts-union", f"ark:{tmp_path}/x.ark",
                 f"ark:{tmp_path}/y.ark", f"ark:{tmp_path}/un.ark"]) == 0
    u = dict(SequentialTableReader(f"ark:{tmp_path}/un.ark",
                                   holder="fst"))["u"]
    arcs, cost = shortest_path(u)
    assert cost == pytest.approx(0.5)        # f2's path is cheaper
    assert main(["fsts-project", "--project-output=true",
                 f"ark:{tmp_path}/x.ark", f"ark:{tmp_path}/pr.ark"]) == 0
    p = dict(SequentialTableReader(f"ark:{tmp_path}/pr.ark",
                                   holder="fst"))["u"]
    assert p.arcs[p.start][0].ilabel == 11


def test_make_grammar_fst(tmp_path):
    """Top HCLG with a nonterminal arc; splicing the sub-FST yields
    the sub's path inline (grammar.replace_nonterminals contract)."""
    NT = 1000
    top = VectorFst()
    s = [top.add_state() for _ in range(3)]
    top.start = s[0]
    top.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    top.add_arc(s[1], Arc(NT, 0, 0.0, s[2]))
    top.set_final(s[2], 0.0)
    sub = VectorFst()
    t = [sub.add_state() for _ in range(2)]
    sub.start = t[0]
    sub.add_arc(t[0], Arc(2, 2, 0.5, t[1]))
    sub.set_final(t[1], 0.0)
    _write_fst(tmp_path / "top.fst", top)
    _write_fst(tmp_path / "sub.fst", sub)
    assert main(["make-grammar-fst", str(tmp_path / "top.fst"),
                 str(NT), str(tmp_path / "sub.fst"),
                 str(tmp_path / "g.fst")]) == 0
    from kaldi_tpu.fst.openfst_io import read_fst_path
    from kaldi_tpu.fst.ops import shortest_path
    g = read_fst_path(str(tmp_path / "g.fst"))
    arcs, cost = shortest_path(g)
    assert [a.ilabel for a in arcs if a.ilabel] == [1, 2]
    assert cost == pytest.approx(0.5)


def test_proxy_keywords(tmp_path, capsys):
    # lexicon: word 1 = [5 6 7], word 2 = [5 6 8] (1 sub away),
    # word 3 = [9] (far)
    (tmp_path / "lex.int").write_text("1 5 6 7\n2 5 6 8\n3 9\n")
    with TableWriter(f"ark,t:{tmp_path}/kw.txt", holder="text") as w:
        w["kw1"] = ["1"]
    assert main(["generate-proxy-keywords", "--proxy-beam=1.5",
                 str(tmp_path / "lex.int"), f"ark,t:{tmp_path}/kw.txt",
                 f"ark:{tmp_path}/px.ark"]) == 0
    px = dict(SequentialTableReader(f"ark:{tmp_path}/px.ark",
                                    holder="fst"))["kw1"]
    got = {a.olabel: a.weight for a in px.arcs[px.start]}
    assert set(got) == {1, 2}                 # itself + the near word
    assert got[1] == pytest.approx(0.0)
    assert got[2] == pytest.approx(1.0)
    assert main(["print-proxy-keywords", f"ark:{tmp_path}/px.ark"]) == 0
    out = capsys.readouterr().out
    assert "kw1 1 0.0000" in out and "kw1 2 1.0000" in out
