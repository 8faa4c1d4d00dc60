"""Round-trip tests for core I/O and tables.

Mirrors the reference's randomized round-trip testing style
(src/util/kaldi-table-test.cc, src/base/io-funcs-test.cc).
"""

import io
import os

import numpy as np
import pytest

from kaldi_tpu.core import io as kio
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (
    RandomAccessTableReader,
    SequentialTableReader,
    TableWriter,
)
from kaldi_tpu.core.logging import KaldiError


def test_basic_types_roundtrip():
    f = io.BytesIO()
    kio.write_basic_int32(f, -12345)
    kio.write_basic_float(f, 3.25)
    kio.write_token(f, "<Foo>")
    kio.write_int_vector(f, [1, 2, 3, 700000])
    f.seek(0)
    assert kio.read_basic_int32(f) == -12345
    assert kio.read_basic_float(f) == 3.25
    assert kio.read_token(f) == "<Foo>"
    np.testing.assert_array_equal(kio.read_int_vector(f), [1, 2, 3, 700000])


def test_matrix_vector_roundtrip(rng):
    for shape in [(1, 1), (5, 13), (40, 40)]:
        m = rng.standard_normal(shape).astype(np.float32)
        f = io.BytesIO()
        kio.write_matrix(f, m)
        f.seek(0)
        np.testing.assert_array_equal(kio.read_matrix(f), m)
    v = rng.standard_normal(17).astype(np.float32)
    f = io.BytesIO()
    kio.write_vector(f, v)
    f.seek(0)
    np.testing.assert_array_equal(kio.read_vector(f), v)


@pytest.mark.parametrize("text", [False, True])
def test_ark_roundtrip_matrix(tmp_path, rng, text):
    ark = str(tmp_path / "feats.ark")
    spec = ("ark,t:" if text else "ark:") + ark
    data = {f"utt{i}": rng.standard_normal((10 + i, 13)).astype(np.float32)
            for i in range(4)}
    with TableWriter(spec, holder="mat") as w:
        for k, v in data.items():
            w[k] = v
    got = dict(SequentialTableReader("ark:" + ark, holder="mat"))
    assert set(got) == set(data)
    for k in data:
        np.testing.assert_allclose(got[k], data[k], atol=1e-5 if text else 0)


def test_ark_scp_random_access(tmp_path, rng):
    ark = str(tmp_path / "x.ark")
    scp = str(tmp_path / "x.scp")
    data = {f"u{i}": rng.standard_normal((7, 4)).astype(np.float32) for i in range(5)}
    with TableWriter(f"ark,scp:{ark},{scp}", holder="mat") as w:
        for k, v in data.items():
            w[k] = v
    r = RandomAccessTableReader("scp:" + scp, holder="mat")
    for k in ["u3", "u0", "u4"]:
        np.testing.assert_array_equal(r[k], data[k])
    assert "nope" not in r


def test_ivec_and_text_holders(tmp_path):
    ark = str(tmp_path / "ali.ark")
    with TableWriter("ark:" + ark, holder="ivec") as w:
        w["utt1"] = np.array([4, 4, 5, 6], dtype=np.int32)
        w["utt2"] = np.array([], dtype=np.int32)
    got = dict(SequentialTableReader("ark:" + ark, holder="ivec"))
    np.testing.assert_array_equal(got["utt1"], [4, 4, 5, 6])
    assert len(got["utt2"]) == 0

    txt = str(tmp_path / "text")
    with TableWriter("ark,t:" + txt, holder="text") as w:
        w["utt1"] = "YES NO YES"
        w["utt2"] = ["NO", "NO"]
    got = dict(SequentialTableReader("ark:" + txt, holder="text"))
    assert got["utt1"] == ["YES", "NO", "YES"]
    assert got["utt2"] == ["NO", "NO"]


def test_wav_holder_roundtrip(tmp_path, rng):
    ark = str(tmp_path / "wav.ark")
    wave = (rng.standard_normal(1600) * 0.1).astype(np.float32)
    with TableWriter("ark:" + ark, holder="wav") as w:
        w["utt1"] = (wave, 8000)
    got = dict(SequentialTableReader("ark:" + ark, holder="wav"))
    samples, rate = got["utt1"]
    assert rate == 8000
    np.testing.assert_allclose(samples / 32767.0, wave, atol=1.0 / 32000)


def test_pipe_rxfilename(tmp_path):
    p = tmp_path / "x.txt"
    p.write_bytes(b"hello")
    with kio.open_rxfilename(f"cat {p} |") as f:
        assert f.read() == b"hello"


def test_offset_rxfilename(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"0123456789")
    with kio.open_rxfilename(f"{p}:4") as f:
        assert f.read(3) == b"456"


def test_parse_options(tmp_path):
    po = ParseOptions("usage")
    po.register("beam", float, 16.0, "Decoding beam")
    po.register("max-active", int, 7000, "Max active states")
    po.register("binary", bool, True, "Write binary")
    cfg = tmp_path / "decode.conf"
    cfg.write_text("--max-active=2000\n# comment\n")
    args = po.read(["--beam=13.0", "--binary=false",
                    f"--config={cfg}", "model.mdl", "ark:feats.ark"])
    assert po["beam"] == 13.0
    assert po["max-active"] == 2000
    assert po["binary"] is False
    assert args == ["model.mdl", "ark:feats.ark"]
    assert po.get_arg(1) == "model.mdl"

    with pytest.raises(KaldiError):
        po.read(["--no-such-option=1"])


def test_parse_options_struct():
    class DecoderConfig:
        def __init__(self):
            self.beam = 16.0
            self.lattice_beam = 10.0
            self.max_active = 7000

    po = ParseOptions()
    cfg = DecoderConfig()
    po.register_struct(cfg)
    po.read(["--beam=13.0", "--lattice-beam=6.0"])
    assert cfg.beam == 13.0
    assert cfg.lattice_beam == 6.0
    assert cfg.max_active == 7000
