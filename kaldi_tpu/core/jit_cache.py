"""Persistent XLA compilation cache (the "pay the compile once, ever"
policy — VERDICT r2 #4).

The reference pays zero JIT cost, so time-to-first-audio parity
demands that a given (program, shape, config) is compiled by XLA at
most once per machine.  ``enable()`` points JAX's persistent
compilation cache at a durable directory; every entry point that
compiles the decoder or a training step calls it.  Measured on the
hard-corpus decoder (v5e-class scan, CPU backend): cold compile
~127 s, warm ~17 s — the residue is Python tracing + StableHLO
lowering, which JAX does not cache; XLA compilation itself is fully
cached.

Shape-bucket policy (documented here because it is what makes the
cache finite): utterance batches pad T up to a multiple of the
``bucket`` parameter (pipelines/hard.py `_batches`, bench.py), so an
arbitrary corpus maps onto a handful of executables instead of one
per distinct length.
"""

from __future__ import annotations

import os

_enabled = False

DEFAULT_DIR = os.environ.get(
    "KALDI_TPU_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_ccache"))


def enable(cache_dir: str = None) -> str:
    """Idempotently enable the persistent compilation cache.  Returns
    the cache directory (or "" if JAX refused, e.g. too old)."""
    global _enabled
    import jax
    if _enabled:
        return DEFAULT_DIR
    d = cache_dir or DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1)
        _enabled = True
        return d
    except Exception:       # pragma: no cover - old jax
        return ""
