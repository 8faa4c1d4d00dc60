"""CLI bank 30: legacy online family (GMM streaming + UDP/TCP
servers/clients), online2bin nnet2 streaming + nnet3 grammar/
incremental/wake-word, codec round-trip, ivector odds and ends."""

import socket
import threading
import time

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
    return np.random.default_rng(30)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _gmm_wav_system(tmp_path, rng, D=39):
    """GMM system + wav + offline-decoded reference words."""
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.features import (DeltaFeaturesOptions,
                                    FrameExtractionOptions, Mfcc,
                                    MfccOptions, add_deltas)
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("YES", ["Y", "EH", "S"]),
                           ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"YES": 1.0, "NO": 1.0})),
        lang.words))
    P, M = tree.num_pdfs, 2
    am = AmDiagGmm(rng.dirichlet(np.ones(M), size=P),
                   rng.standard_normal((P, M, D)),
                   0.5 + rng.random((P, M, D)))
    mdl = str(tmp_path / "final.mdl")
    write_mdl(mdl, tm, am)
    fstp = str(tmp_path / "HCLG.txt")
    HCLG.write_text(fstp)
    words_txt = str(tmp_path / "words.txt")
    lang.words.write(words_txt)
    wave = (rng.standard_normal(12000) * 500).astype(np.int16)
    wark = f"ark:{tmp_path}/w.ark"
    with TableWriter(wark, holder="wav") as w:
        w["u0"] = (wave, 16000)
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(dither=0.0)))
    feats = np.asarray(add_deltas(mfcc.compute(wave.astype(np.float32)),
                                  DeltaFeaturesOptions()))
    dec = DenseDecoder(HCLG, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=16.0,
                                          acoustic_scale=0.1))
    _t, ref_ols, _c = dec.decode(np.asarray(am.loglikes(feats)))
    ref = [lang.words.find(o) for o in ref_ols]
    return mdl, fstp, words_txt, wark, wave, ref, lang


# ---------------------------------------------------------------------------
# legacy online family


def test_online_wav_gmm_decode_faster(tmp_path, rng):
    mdl, fstp, words_txt, wark, _wave, ref, _lang = \
        _gmm_wav_system(tmp_path, rng)
    assert main(["online-wav-gmm-decode-faster",
                 f"--word-symbol-table={words_txt}", mdl, fstp, wark,
                 f"ark:{tmp_path}/out.ark",
                 f"ark:{tmp_path}/ali.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/out.ark",
                                     holder="text"))["u0"]
    assert got == ref
    ali = dict(SequentialTableReader(f"ark:{tmp_path}/ali.ark",
                                     holder="ivec"))["u0"]
    assert len(ali) > 0


def test_online_gmm_decode_faster_stdin_sub(tmp_path, rng, capsys):
    mdl, fstp, words_txt, _wark, wave, ref, _lang = \
        _gmm_wav_system(tmp_path, rng)
    raw = str(tmp_path / "mic.raw")
    with open(raw, "wb") as f:
        f.write(wave.astype(np.int16).tobytes())
    assert main(["online-gmm-decode-faster", f"--audio={raw}", mdl,
                 fstp, words_txt]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[-1].split() == ref


def test_online_udp_server_and_client(tmp_path, rng, capsys):
    mdl, fstp, words_txt, wark, _wave, ref, _lang = \
        _gmm_wav_system(tmp_path, rng)
    port = _free_port()
    th = threading.Thread(target=main, args=([
        "online-server-gmm-decode-faster", f"--udp-port={port}",
        "--max-utterances=1", mdl, fstp, words_txt],), daemon=True)
    th.start()
    time.sleep(1.0)
    assert main(["online-net-client", "127.0.0.1", str(port),
                 wark]) == 0
    th.join(timeout=60)
    out = capsys.readouterr().out.strip()
    assert out.split()[0] == "u0"
    assert out.split()[1:] == ref


def test_online_tcp_audio_server_and_client(tmp_path, rng, capsys):
    mdl, fstp, words_txt, wark, _wave, ref, _lang = \
        _gmm_wav_system(tmp_path, rng)
    port = _free_port()
    # budget 2 connections: the readiness probe (empty audio) + the
    # real client
    th = threading.Thread(target=main, args=([
        "online-audio-server-decode-faster", f"--port-num={port}",
        "--max-connections=2", mdl, fstp, words_txt],), daemon=True)
    th.start()
    deadline = time.time() + 30
    up = False
    while time.time() < deadline and not up:
        try:
            probe = socket.create_connection(("127.0.0.1", port),
                                             timeout=1)
            probe.shutdown(socket.SHUT_WR)
            probe.recv(64)
            probe.close()
            up = True
        except OSError:
            time.sleep(0.2)
    assert up, "server never came up"
    assert main(["online-audio-client", "127.0.0.1", str(port),
                 wark]) == 0
    th.join(timeout=60)
    out = capsys.readouterr().out
    result_lines = [ln for ln in out.splitlines()
                    if ln.startswith("u0 RESULT:")]
    assert result_lines
    assert result_lines[0].split("RESULT:")[1].split() == ref
    word_lines = [ln for ln in out.splitlines()
                  if ln.startswith("u0 WORD:")]
    assert len(word_lines) == len(ref)


# ---------------------------------------------------------------------------
# nnet2 streaming


def _nnet2_wav_system(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(13), np.ones(13))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    assert main(["nnet-am-init", "--feat-dim=13",
                 f"--num-pdfs={tree.num_pdfs}", "--num-hidden-layers=2",
                 "--pnorm-input-dim=16", "--pnorm-output-dim=8",
                 str(tmp_path / "m.nnet2")]) == 0
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    fstp = str(tmp_path / "HCLG.txt")
    HCLG.write_text(fstp)
    wave = (rng.standard_normal(9600) * 500).astype(np.int16)
    wark = f"ark:{tmp_path}/w.ark"
    with TableWriter(wark, holder="wav") as w:
        w["u0"] = (wave, 16000)
        w["u1"] = ((rng.standard_normal(8000) * 400).astype(
            np.int16), 16000)
    return mdl, str(tmp_path / "m.nnet2"), fstp, wark, wave, lang


def test_online2_wav_nnet2_am_compute_matches_offline(tmp_path, rng):
    import jax.numpy as jnp
    from kaldi_tpu.am.nnet2 import Nnet2Model, load_nnet2
    from kaldi_tpu.features import (FrameExtractionOptions, Mfcc,
                                    MfccOptions)
    _mdl, nnet2, _fstp, wark, wave, _lang = \
        _nnet2_wav_system(tmp_path, rng)
    assert main(["online2-wav-nnet2-am-compute", nnet2, wark,
                 f"ark:{tmp_path}/post.ark"]) == 0
    got = dict(SequentialTableReader(f"ark:{tmp_path}/post.ark",
                                     holder="mat"))["u0"]
    mfcc = Mfcc(MfccOptions(
        frame_opts=FrameExtractionOptions(dither=0.0)))
    feats = np.asarray(mfcc.compute(wave.astype(np.float32)), np.float32)
    params, cfg = load_nnet2(nnet2)
    want = np.asarray(Nnet2Model(cfg).apply(
        {"params": params}, jnp.asarray(feats)[None]))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_online2_wav_nnet2_latgen_and_threaded(tmp_path, rng):
    mdl, nnet2, fstp, wark, _wave, lang = \
        _nnet2_wav_system(tmp_path, rng)
    words_txt = str(tmp_path / "words.txt")
    lang.words.write(words_txt)
    assert main(["online2-wav-nnet2-latgen-faster",
                 f"--word-symbol-table={words_txt}", mdl, nnet2, fstp,
                 wark, f"ark:{tmp_path}/w1.ark"]) == 0
    assert main(["online2-wav-nnet2-latgen-threaded",
                 "--num-threads=2",
                 f"--word-symbol-table={words_txt}", mdl, nnet2, fstp,
                 wark, f"ark:{tmp_path}/w2.ark"]) == 0
    h1 = dict(SequentialTableReader(f"ark:{tmp_path}/w1.ark",
                                    holder="text"))
    h2 = dict(SequentialTableReader(f"ark:{tmp_path}/w2.ark",
                                    holder="text"))
    assert set(h1) == {"u0", "u1"}
    assert h1 == h2                       # threading changes nothing
    vocab = {"GO", "NO"}
    for text in h1.values():
        assert set(text) <= vocab


# ---------------------------------------------------------------------------
# nnet3 grammar / incremental / wake word


def _nnet3_wav_system(tmp_path, rng):
    from kaldi_tpu.fst import (ArpaModel, Lang, Lexicon, arpa_to_fst,
                               make_unigram_arpa, mkgraph)
    lex = Lexicon(entries=[("GO", ["G", "OW"]), ("NO", ["N", "OW"])])
    lang = Lang(lex)
    phones = lang.phone_list()
    topo = HmmTopology.three_state(phones)
    tree = MonophoneContextDependency(phones, topo)
    tm = TransitionModel(topo, tree)
    am = AmDiagGmm.flat_start(tree.num_pdfs, np.zeros(13), np.ones(13))
    mdl = str(tmp_path / "trans.mdl")
    write_mdl(mdl, tm, am)
    assert main(["nnet3-init", "--feat-dim=13",
                 f"--num-pdfs={tree.num_pdfs}", "--hidden-dim=8",
                 "--bottleneck-dim=4", "--num-layers=2",
                 str(tmp_path / "m.raw")]) == 0
    HCLG = mkgraph(lang, tm, arpa_to_fst(
        ArpaModel.parse(make_unigram_arpa({"GO": 1.0, "NO": 1.0})),
        lang.words))
    fstp = str(tmp_path / "HCLG.txt")
    HCLG.write_text(fstp)
    wark = f"ark:{tmp_path}/w.ark"
    with TableWriter(wark, holder="wav") as w:
        w["u0"] = ((rng.standard_normal(9600) * 500).astype(
            np.int16), 16000)
    return mdl, str(tmp_path / "m.raw"), fstp, wark, lang


def test_online2_nnet3_grammar_matches_plain(tmp_path, rng):
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.fst import Arc, VectorFst
    mdl, raw, fstp, wark, lang = _nnet3_wav_system(tmp_path, rng)
    words_txt = str(tmp_path / "words.txt")
    lang.words.write(words_txt)
    top = VectorFst()
    a, b = top.add_state(), top.add_state()
    top.start = a
    top.add_arc(a, Arc(999, 0, 0.0, b))
    top.set_final(b, 0.0)
    _save_fst(str(tmp_path / "top.fst"), top)
    common = ["--frame-subsampling-factor=1",
              f"--word-symbol-table={words_txt}"]
    assert main(["online2-wav-nnet3-latgen-grammar"] + common
                + [mdl, raw, str(tmp_path / "top.fst"), "999", fstp,
                   wark, f"ark:{tmp_path}/g.ark"]) == 0
    assert main(["online2-wav-nnet3-latgen-faster"] + common
                + [mdl, raw, fstp, wark,
                   f"ark:{tmp_path}/p.ark"]) == 0
    g = dict(SequentialTableReader(f"ark:{tmp_path}/g.ark",
                                   holder="text"))["u0"]
    p = dict(SequentialTableReader(f"ark:{tmp_path}/p.ark",
                                   holder="text"))["u0"]
    assert g == p


def test_online2_nnet3_incremental(tmp_path, rng):
    mdl, raw, fstp, wark, lang = _nnet3_wav_system(tmp_path, rng)
    assert main(["online2-wav-nnet3-latgen-incremental",
                 "--frame-subsampling-factor=1", mdl, raw, fstp, wark,
                 f"ark:{tmp_path}/lat.ark"]) == 0
    lat = dict(SequentialTableReader(f"ark:{tmp_path}/lat.ark",
                                     holder="clat"))["u0"]
    words, _tids, _cost = lat.best_path()
    vocab = {lang.words["GO"], lang.words["NO"]}
    assert all(w in vocab for w in words)


def test_wake_word_decoder(tmp_path, rng):
    mdl, raw, fstp, wark, lang = _nnet3_wav_system(tmp_path, rng)
    # wake word = whatever the decoder hypothesizes first; verify the
    # contract both ways: hypothesized word → detected, bogus id → not
    assert main(["online2-wav-nnet3-latgen-faster",
                 "--frame-subsampling-factor=1", mdl, raw, fstp, wark,
                 f"ark:{tmp_path}/ref.ark"]) == 0
    hyp = dict(SequentialTableReader(f"ark:{tmp_path}/ref.ark",
                                     holder="text"))["u0"]
    assert main(["online2-wav-nnet3-wake-word-decoder-faster",
                 "--frame-subsampling-factor=1", mdl, raw, fstp,
                 "99999", wark, f"ark:{tmp_path}/miss.ark"]) == 0
    miss = dict(SequentialTableReader(f"ark:{tmp_path}/miss.ark",
                                      holder="text"))["u0"]
    assert miss[0] == "0" and miss[1] == "-1"
    if hyp:                               # a real word was decoded
        wake = str(int(hyp[0]))
        assert main(["online2-wav-nnet3-wake-word-decoder-faster",
                     "--frame-subsampling-factor=1", mdl, raw, fstp,
                     wake, wark, f"ark:{tmp_path}/hit.ark"]) == 0
        hit = dict(SequentialTableReader(f"ark:{tmp_path}/hit.ark",
                                         holder="text"))["u0"]
        assert hit[0] == "1" and int(hit[1]) > 0


# ---------------------------------------------------------------------------
# codec + ivector odds and ends


def test_compress_uncompress_speex_mulaw(tmp_path, rng):
    wave = (rng.standard_normal(4000) * 3000).astype(np.int16)
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        w["u"] = (wave, 8000)
    assert main(["compress-uncompress-speex", f"ark:{tmp_path}/w.ark",
                 f"ark:{tmp_path}/c.ark"]) == 0
    out, rate = dict(SequentialTableReader(f"ark:{tmp_path}/c.ark",
                                           holder="wav"))["u"]
    assert rate == 8000 and len(out) == len(wave)
    # lossy but close: SNR above ~20 dB for µ-law 8-bit
    err = np.asarray(out, np.float64) - wave
    snr = 10 * np.log10((wave.astype(np.float64) ** 2).mean()
                        / max((err ** 2).mean(), 1e-10))
    assert snr > 20.0
    assert not np.array_equal(out, wave)  # genuinely lossy


def test_ivector_randomize(tmp_path, rng):
    m = rng.standard_normal((30, 5)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/i.ark", holder="mat") as w:
        w["u"] = m
    assert main(["ivector-randomize", "--randomize-prob=1.0",
                 "--srand=1", f"ark:{tmp_path}/i.ark",
                 f"ark:{tmp_path}/o.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/o.ark",
                                     holder="mat"))["u"]
    # last row can only map to itself; every row must come from a
    # row at the same or a later time
    np.testing.assert_allclose(out[-1], m[-1])
    rows = {tuple(np.round(r, 5)) for r in m}
    for t in range(len(out)):
        assert tuple(np.round(out[t], 5)) in rows


def test_ivector_extractor_copy(tmp_path, rng):
    from kaldi_tpu.am.ivector import (IvectorExtractor,
                                      read_ivector_extractor,
                                      write_ivector_extractor)
    ex = IvectorExtractor(rng.standard_normal((4, 6)),
                          0.5 + rng.random((4, 6)),
                          rng.dirichlet(np.ones(4)), 3)
    write_ivector_extractor(str(tmp_path / "a.ie"), ex)
    assert main(["ivector-extractor-copy", str(tmp_path / "a.ie"),
                 str(tmp_path / "b.ie")]) == 0
    ex2 = read_ivector_extractor(str(tmp_path / "b.ie"))
    np.testing.assert_allclose(ex2.T, ex.T, atol=1e-6)
    np.testing.assert_allclose(ex2.means, ex.means, atol=1e-6)
