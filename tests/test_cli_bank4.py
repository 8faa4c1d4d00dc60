"""CLI tool bank 4 (cli/tools_bank4.py): data-dir utils, segmentation,
kws-search, and bin utilities, driven through `main([...])` with real
files, oracled against direct library calls."""

import numpy as np
import pytest

from kaldi_tpu.cli import main
from kaldi_tpu.core.table import SequentialTableReader, TableWriter
from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
from kaldi_tpu.pipelines.datadir import DataDir, read_data_dir, \
    write_data_dir


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _write_dir(tmp_path, name="data", n_spk=2, per_spk=3):
    utt2spk, text, wav = {}, {}, {}
    for s in range(n_spk):
        for i in range(per_spk):
            u = f"spk{s}-utt{i}"
            utt2spk[u] = f"spk{s}"
            text[u] = ["YES", "NO"]
            wav[u] = f"/x/{u}.wav"
    d = DataDir(wav_scp=wav, text=text, utt2spk=utt2spk)
    path = str(tmp_path / name)
    write_data_dir(path, d)
    return path, d


def test_spk2utt_tools(tmp_path, capsys):
    path, d = _write_dir(tmp_path)
    out = str(tmp_path / "spk2utt.out")
    assert main(["utt2spk-to-spk2utt", f"{path}/utt2spk", out]) == 0
    assert open(out).read() == open(f"{path}/spk2utt").read()
    back = str(tmp_path / "utt2spk.out")
    assert main(["spk2utt-to-utt2spk", out, back]) == 0
    assert open(back).read() == open(f"{path}/utt2spk").read()


def test_validate_fix_subset_split(tmp_path):
    path, d = _write_dir(tmp_path, n_spk=3, per_spk=4)
    assert main(["validate-data-dir", path]) == 0
    # break it: drop one utterance from text
    lines = open(f"{path}/text").read().splitlines()
    open(f"{path}/text", "w").write("\n".join(lines[1:]) + "\n")
    assert main(["validate-data-dir", path]) == 1
    assert main(["fix-data-dir", path]) == 0
    assert main(["validate-data-dir", path]) == 0
    assert len(read_data_dir(path).utt2spk) == 11

    sub = str(tmp_path / "sub")
    assert main(["subset-data-dir", "--per-spk=2", path, sub]) == 0
    ds = read_data_dir(sub)
    assert all(len(us) == 2 for us in ds.spk2utt().values())

    assert main(["split-data", path, "2"]) == 0
    s1 = read_data_dir(f"{path}/split2/1")
    s2 = read_data_dir(f"{path}/split2/2")
    assert len(s1.utt2spk) + len(s2.utt2spk) == 11
    assert not (set(s1.utt2spk.values()) & set(s2.utt2spk.values()))


def test_sym_int_tools(tmp_path):
    (tmp_path / "words.txt").write_text(
        "<eps> 0\nYES 1\nNO 2\n<unk> 3\n")
    (tmp_path / "text").write_text("u1 YES NO\nu2 NO MAYBE\n")
    out = str(tmp_path / "ints")
    assert main(["sym2int", "--map-oov=<unk>", str(tmp_path / "words.txt"),
                 str(tmp_path / "text"), out]) == 0
    assert open(out).read() == "u1 1 2\nu2 2 3\n"
    back = str(tmp_path / "syms")
    assert main(["int2sym", str(tmp_path / "words.txt"), out, back]) == 0
    assert open(back).read() == "u1 YES NO\nu2 NO <unk>\n"


def test_segment_long_utterances_tool(tmp_path, rng):
    rate = 8000
    wave = 0.001 * rng.standard_normal(rate * 4).astype(np.float32)
    for tb, te in [(0.5, 1.4), (2.5, 3.4)]:
        t = np.arange(int((te - tb) * rate)) / rate
        wave[int(tb * rate):int(tb * rate) + len(t)] += \
            0.4 * np.sin(2 * np.pi * 300 * t).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/wav.ark", holder="wav") as w:
        w["reco1"] = (wave, rate)
    segf = str(tmp_path / "segments")
    assert main(["segment-long-utterances", f"ark:{tmp_path}/wav.ark",
                 segf]) == 0
    segs = [line.split() for line in open(segf)]
    assert len(segs) == 2
    assert segs[0][1] == "reco1"
    assert abs(float(segs[0][2]) - 0.5) < 0.2
    assert abs(float(segs[1][3]) - 3.4) < 0.2


def _linear_clat(words, frames_per_word=3):
    clat = CompactLattice()
    for _ in range(len(words) + 1):
        clat.add_state()
    clat.start = 0
    for i, w in enumerate(words):
        clat.arcs[i].append(CompactArc(w, 0.1, 1.0 * frames_per_word,
                                       (1,) * frames_per_word, i + 1))
    clat.finals[len(words)] = (0.0, 0.0, ())
    return clat


def test_kws_search_tool(tmp_path):
    with open(tmp_path / "lat.ark", "wb") as f:
        pass
    with TableWriter(f"ark:{tmp_path}/lat.ark", holder="clat") as w:
        w["u1"] = _linear_clat([5, 7, 9])
        w["u2"] = _linear_clat([7, 9, 5])
    (tmp_path / "keywords.txt").write_text("KW1 7 9\nKW2 5\n")
    hits_path = f"ark,t:{tmp_path}/hits.txt"
    assert main(["kws-search", f"ark:{tmp_path}/lat.ark",
                 str(tmp_path / "keywords.txt"), hits_path]) == 0
    hits = dict(SequentialTableReader(f"ark:{tmp_path}/hits.txt",
                                      holder="text"))
    kw1 = [v for k, v in hits.items() if k.startswith("KW1")]
    assert sorted(h[0] for h in kw1) == ["u1", "u2"]
    for h in kw1:
        assert float(h[3]) > 0.9  # linear lattice: posterior 1
    # non-index path agrees
    assert main(["kws-search", "--use-index=false",
                 f"ark:{tmp_path}/lat.ark",
                 str(tmp_path / "keywords.txt"),
                 f"ark,t:{tmp_path}/hits2.txt"]) == 0
    hits2 = dict(SequentialTableReader(f"ark:{tmp_path}/hits2.txt",
                                       holder="text"))
    assert {k: v for k, v in hits.items()} == hits2


def test_vector_and_wav_tools(tmp_path, rng):
    v1 = rng.standard_normal(5).astype(np.float32)
    v2 = rng.standard_normal(5).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/v1.ark", holder="vec") as w:
        w["u1"] = v1
    with TableWriter(f"ark:{tmp_path}/v2.ark", holder="vec") as w:
        w["u1"] = v2
    assert main(["copy-vector", "--scale=2.0", f"ark:{tmp_path}/v1.ark",
                 f"ark:{tmp_path}/v1x2.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/v1x2.ark",
                                     holder="vec"))
    np.testing.assert_allclose(out["u1"], 2.0 * v1, rtol=1e-6)
    assert main(["vector-sum", f"ark:{tmp_path}/v1.ark",
                 f"ark:{tmp_path}/v2.ark",
                 f"ark:{tmp_path}/sum.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/sum.ark",
                                     holder="vec"))
    np.testing.assert_allclose(out["u1"], v1 + v2, rtol=1e-6)

    wave = (0.1 * rng.standard_normal(800)).astype(np.float32)
    with TableWriter(f"ark:{tmp_path}/w.ark", holder="wav") as w:
        w["u1"] = (wave, 8000)
    assert main(["wav-copy", f"ark:{tmp_path}/w.ark",
                 f"ark:{tmp_path}/w2.ark"]) == 0
    out = dict(SequentialTableReader(f"ark:{tmp_path}/w2.ark",
                                     holder="wav"))
    w2, rate = out["u1"]
    assert rate == 8000
    # the wav holder stores 16-bit PCM; reads come back at int16 scale
    np.testing.assert_allclose(w2 / 32767.0, wave, atol=1e-4)
