#!/usr/bin/env python
"""Thin spark-submit shim: the driver script stays OUTSIDE the shipped
zip (spark-submit requires a file path), all logic lives in
cpg_spark.job which arrives on driver and executors via --py-files.

    spark-submit --py-files cpg_spark.zip scripts/cpg_job.py \\
        --input <docs uri> --workdir <checkpoint root>
"""

from cpg_spark.job import main

if __name__ == "__main__":
    raise SystemExit(main())
