import sys

from kaldi_tpu.cli.tools import main

sys.exit(main())
