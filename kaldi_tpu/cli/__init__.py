"""CLI layer (reference L10: src/*bin/)."""

from kaldi_tpu.cli.tools import TOOLS, main

__all__ = ["TOOLS", "main"]
