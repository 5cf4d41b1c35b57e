"""Thin spark-submit launcher:

    zip -r wds.zip webarchive_discovery_spark
    spark-submit --master <cluster> --py-files wds.zip scripts/run_job.py \
        crawl --synthetic 100000 --epochs 3 -o /out/crawl_log

spark-submit ships ``--py-files`` to every executor; the driver only needs
this file on its local filesystem.
"""

import sys

from webarchive_discovery_spark.cli import main

sys.exit(main(sys.argv[1:]))
