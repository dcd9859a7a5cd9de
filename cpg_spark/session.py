"""SparkSession factory used by tests, bench, and the driver entry point."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cpg_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """local[N] session tuned for this sandbox; on a real cluster the same
    pipeline runs unchanged via ``spark-submit --py-files`` (the only
    local-specific knob is ``spark.driver.memory``)."""
    # make the package importable inside forked Python workers regardless of
    # the caller's cwd (cluster deployments ship it via --py-files instead)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # match core count locally; on a cluster this should be
        # ~2-3x total executor cores, or left to AQE coalescing
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("CPG_SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # zstd halves stage-commit bytes vs snappy at ~equal CPU: measured
        # 45.3s -> 37.0s pipeline and -42% bytes at 24k docs; at corpus
        # scale smaller checkpoints also mean less shuffle-read and less
        # object-store traffic
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    # shuffle/spill scratch dirs.  On a cluster every executor has its own
    # local disks (NVMe), so shuffle I/O scales with machines; this sandbox
    # shares ONE virtual disk across all local threads, which becomes the
    # bottleneck at high parallelism (measured: parse+persist 94.7 s on
    # disk vs 69.7 s on tmpfs at local[32]/192k docs, identical at
    # local[8]).  CPG_SPARK_LOCAL_DIR (e.g. a tmpfs path) models the
    # per-executor-local-storage reality for scaling measurements.
    local_dir = os.environ.get("CPG_SPARK_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
