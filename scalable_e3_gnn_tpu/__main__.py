"""``python -m scalable_e3_gnn_tpu`` — see cli.py."""

import sys

from .cli import main

sys.exit(main())
