"""``python -m openccnet_spark`` — reference-parity CLI entry point."""

import sys

from .cli import main

sys.exit(main())
