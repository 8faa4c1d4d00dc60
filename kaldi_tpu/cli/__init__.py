"""CLI layer (reference L10: src/*bin/)."""

from kaldi_tpu.cli.tools import TOOLS, main
import kaldi_tpu.cli.tools_extra  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank3  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank4  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank5  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank6  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank7  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank8  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank9  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank10  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank11  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank12  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank13  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank14  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank15  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank16  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank17  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank18  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank19  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank20  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank21  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank22  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank23  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank24  # noqa: F401  (registers into TOOLS)
import kaldi_tpu.cli.tools_bank25  # noqa: F401  (registers into TOOLS)

__all__ = ["TOOLS", "main"]
