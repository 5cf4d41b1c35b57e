"""``python -m webarchive_discovery_spark`` / spark-submit entry."""

import sys

from .cli import main

sys.exit(main())
