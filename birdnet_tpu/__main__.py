"""``python -m birdnet_tpu`` → the birdnet-analyze CLI."""

import sys

from .cli import main

sys.exit(main())
