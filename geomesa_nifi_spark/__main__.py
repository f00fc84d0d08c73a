"""`python -m geomesa_nifi_spark` / spark-submit driver (see cli.py)."""

import sys

from geomesa_nifi_spark.cli import main

sys.exit(main())
