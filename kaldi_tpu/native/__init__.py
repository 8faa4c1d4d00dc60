"""Native (C++) host-runtime components.

The reference implements its host runtime — decoders' lattice passes,
table I/O, graph build — in C++; the TPU build keeps the COMPUTE path
in XLA/Pallas but implements the per-utterance host hot loops natively
too.  Components are plain C-linkage shared objects loaded via ctypes
(no pybind11 in this environment); each has a numpy reference
implementation that serves as both oracle (tests compare them) and
fallback when no compiler is available.

Build-on-demand: the .so is compiled with g++ -O3 on first use and
cached next to the sources; set KALDI_TPU_NO_NATIVE=1 to force the
numpy fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from kaldi_tpu.core.logging import get_logger

log = get_logger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    src = os.path.join(_DIR, "lattice_build.cpp")
    so = os.path.join(_DIR, "liblattice_build.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so + ".tmp"],
                check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
            log.info("native: compiled %s", os.path.basename(so))
        except Exception as e:
            log.warning("native: build failed (%s); using numpy fallback",
                        e)
            return None
    try:
        return ctypes.CDLL(so)
    except OSError as e:
        log.warning("native: load failed (%s); using numpy fallback", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("KALDI_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            _LIB = _build_and_load()
            if _LIB is not None:
                _bind(_LIB)
    return _LIB


def _bind(lib: ctypes.CDLL) -> None:
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.kt_build_lattice.restype = ctypes.c_int64
    lib.kt_build_lattice.argtypes = [
        ctypes.c_int64, ctypes.c_int64,
        i32p, i32p, i32p, i32p, i32p, f32p, f32p,
        i32p, f32p, ctypes.c_int64,
        f32p, ctypes.c_float, ctypes.c_int64,
        i32p, i32p, i32p, i32p, f32p, f32p,
        i32p, f32p, i64p, i64p,
    ]


def build_lattice_native(counts, prev, dst, tid, ol, gw, ac,
                         init_slots, init_costs, tok_final,
                         lattice_beam: float):
    """Run the native raw-lattice assembly + pruning over PACKED
    records (counts (T,), flat fields of sum(counts)).  Returns
    (src, dst, il, ol, gw, ac, final_states, final_w, n_states) or
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    T = counts.shape[0]
    K = tok_final.shape[0]
    cap = int(prev.shape[0] + len(init_slots) + 1)
    o_src = np.empty(cap, np.int32)
    o_dst = np.empty(cap, np.int32)
    o_il = np.empty(cap, np.int32)
    o_ol = np.empty(cap, np.int32)
    o_gw = np.empty(cap, np.float32)
    o_ac = np.empty(cap, np.float32)
    o_fs = np.empty(K + 1, np.int32)
    o_fw = np.empty(K + 1, np.float32)
    n_fin = ctypes.c_int64(0)
    n_states = ctypes.c_int64(0)

    def c(a, dt):
        return np.ascontiguousarray(a, dt)

    na = lib.kt_build_lattice(
        T, K,
        c(counts, np.int32),
        c(prev, np.int32), c(dst, np.int32), c(tid, np.int32),
        c(ol, np.int32), c(gw, np.float32), c(ac, np.float32),
        c(init_slots, np.int32), c(init_costs, np.float32),
        len(init_slots),
        c(tok_final, np.float32), float(lattice_beam), cap,
        o_src, o_dst, o_il, o_ol, o_gw, o_ac,
        o_fs, o_fw, ctypes.byref(n_fin), ctypes.byref(n_states))
    if na < 0:
        return None
    na = int(na)
    return (o_src[:na], o_dst[:na], o_il[:na], o_ol[:na],
            o_gw[:na], o_ac[:na],
            o_fs[:n_fin.value], o_fw[:n_fin.value], int(n_states.value))
