"""Native lattice determinization vs the Python oracle.

The C++ pass (kaldi_tpu/native/lattice_det.cpp) must agree with
determinize_lattice_py path-semantically on random raw lattices: same
word-sequence → best-cost map, deterministic output, best-path tid
strings preserved.  (The cu-matrix-test pattern from SURVEY.md §4:
the host/Python implementation is the oracle.)
"""

import numpy as np
import pytest

from kaldi_tpu import native
from kaldi_tpu.core.logging import KaldiError
from kaldi_tpu.lattice.determinize import (determinize_lattice,
                                           determinize_lattice_py)
from kaldi_tpu.lattice.lattice import Lattice, LatticeArc

INF = float("inf")

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def _rand_raw(rng, n_layers=6, max_per_layer=4, n_words=4, n_tids=6,
              neg_costs=False):
    lat = Lattice()
    layers = []
    for _ in range(n_layers):
        layers.append([lat.add_state()
                       for _ in range(int(rng.integers(1, max_per_layer)))])
    lat.start = layers[0][0]
    lo = -0.5 if neg_costs else 0.0
    for i in range(n_layers - 1):
        for s in layers[i]:
            for _ in range(int(rng.integers(1, 4))):
                d = int(rng.choice(layers[i + 1]))
                lat.arcs[s].append(LatticeArc(
                    int(rng.integers(0, n_tids)),
                    int(rng.integers(0, n_words + 1)),
                    float(rng.uniform(lo, 2.0)),
                    float(rng.uniform(lo, 2.0)), d))
    for s in layers[-1]:
        lat.set_final(s, float(rng.uniform(0.0, 1.0)),
                      float(rng.uniform(0.0, 1.0)))
    return lat


def _path_map(clat):
    out = {}
    for words, c in clat.paths(max_paths=50000):
        out[words] = min(out.get(words, INF), c)
    return out


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python_oracle(seed):
    rng = np.random.default_rng(seed)
    lat = _rand_raw(rng, neg_costs=(seed % 2 == 1))
    ref = determinize_lattice_py(lat)
    got = determinize_lattice(lat)  # dispatches to native
    # determinism: at most one out-arc per word per state
    for s in range(got.num_states):
        ws = [a.word for a in got.arcs[s]]
        assert len(ws) == len(set(ws))
    ref_map = _path_map(ref)
    got_map = _path_map(got)
    assert set(got_map) == set(ref_map)
    for w in ref_map:
        assert got_map[w] == pytest.approx(ref_map[w], abs=1e-4)
    # best path identical incl. the transition-id string
    rw, rt, rc = ref.best_path()
    gw, gt, gc = got.best_path()
    assert gw == rw
    assert gt == rt
    assert gc == pytest.approx(rc, abs=1e-4)


def test_native_empty_lattice():
    lat = Lattice()
    got = determinize_lattice(lat)
    assert got.num_states == 0 and got.start == -1


def test_native_state_blowup_raises():
    rng = np.random.default_rng(3)
    lat = _rand_raw(rng, n_layers=8, max_per_layer=4)
    with pytest.raises(KaldiError):
        determinize_lattice(lat, max_states=1)


def test_native_initial_residual_eps_arc():
    # a lattice whose start has cost/tids before the first word:
    # the initial residual must come out on a word-eps arc
    lat = Lattice()
    s0, s1, s2 = lat.add_state(), lat.add_state(), lat.add_state()
    lat.start = s0
    lat.arcs[s0].append(LatticeArc(7, 0, 0.5, 0.25, s1))  # eps word
    lat.arcs[s1].append(LatticeArc(8, 3, 1.0, 0.0, s2))   # word 3
    lat.set_final(s2, 0.0, 0.0)
    ref = determinize_lattice_py(lat)
    got = determinize_lattice(lat)
    assert _path_map(got) == _path_map(ref)
    gw, gt, gc = got.best_path()
    assert gw == [3] and gt == [7, 8] and gc == pytest.approx(1.75)
