import signal
import sys

# Behave like a unix tool under `| head` etc.
try:
    signal.signal(signal.SIGPIPE, signal.SIG_DFL)
except (AttributeError, ValueError):
    pass

from kaldi_tpu.cli import main


def entry():
    """console_scripts hook (pyproject [project.scripts])."""
    return main()


if __name__ == "__main__":
    sys.exit(main())
