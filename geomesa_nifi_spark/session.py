"""SparkSession factory with the engine's recommended configuration.

Local-mode settings mirror what we would set on a real cluster: AQE on
(runtime skew-join splitting + partition coalescing), shuffle partitions
sized to the parallelism rather than the 200 default, Arrow enabled for
the pandas-UDF extraction stage, and UTC session time so timestamp
round-trips are deterministic.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
_PYFILES_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the package importable on executor Python workers.

    Equivalent to ``spark-submit --py-files geomesa_nifi_spark.zip`` on a
    real cluster: zip this package and register it via ``addPyFile`` so
    pandas UDFs deserialize anywhere, regardless of the driver's cwd.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _PYFILES_SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_base = os.path.join(tempfile.gettempdir(), "geomesa_nifi_spark_pyfiles")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=root, base_dir="geomesa_nifi_spark")
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SHIPPED.add(app_id)


def get_spark(
    app_name: str = "geomesa_nifi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    — UNLESS the process was launched by spark-submit (its ``spark.master``
    arrives as a JVM system property / SparkConf entry), in which case the
    submitted master and executor topology win and this function only adds
    the engine's cluster-safe session confs.
    """
    if master is None:
        from pyspark import SparkConf

        if SparkConf().get("spark.master", None) is None:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    # Local-mode shuffle/spill dir (GNS_LOCAL_DIR to override; any real
    # cluster manager overrides spark.local.dir wholesale, so this only
    # ever applies to local[...] runs).  Default to the RAM-backed tmpfs
    # when present, for the same reason bench.py's measurement children
    # already did: on a real deployment every executor brings its own
    # local disks, so shuffle bandwidth scales with the cluster — this
    # box's ONE shared disk does not, and a merge's shuffle competing
    # with the page-cache writeback of a preceding bulk write was the
    # dominant source of run-to-run variance in the suite phase.  Point
    # GNS_LOCAL_DIR at a disk path for local shuffles too big for tmpfs.
    local_dir = os.environ.get("GNS_LOCAL_DIR")
    if local_dir is None and (master or "").startswith("local") and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(isAdjustedToUTC=false) as TimestampType, not
        # TIMESTAMP_NTZ — one timestamp type engine-wide (session TZ is UTC,
        # so the semantics are identical and DuckDB oracles hash-match).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # INT96 (the legacy default) carries NO parquet min/max statistics,
        # which would blind the ledger zone maps on every timestamp column;
        # TIMESTAMP_MICROS is the modern interoperable encoding and DuckDB /
        # pyarrow read it identically.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Scan-split size, parameterised (GNS_MAX_PARTITION_BYTES).  The
        # local default is 32 MB, not Spark's 128 MB: a CDC batch's change
        # files are tens of MB, and the map side of the LWW dedup (the
        # partial max_by combine) is input-split-bound — at 128 MB a
        # 160 MB/32-file batch planned 2-3 scan tasks and left 29 of 32
        # cores idle through the heaviest stage (measured: CoW replay
        # 11.2 s -> 9.4 s, MoR 10.7 s -> 6.6 s at sf-bench scale).  On a
        # cluster running monolithic scans, raise it (128 MB - 1 GB) via
        # the env knob or extra_conf; per-executor parallelism there comes
        # from executor counts, not from splitting a single batch finely.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("GNS_MAX_PARTITION_BYTES", str(32 * 1024 * 1024)),
        )
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.enabled", "false")
        # local mode = one JVM: the driver heap IS the executor heap, and it
        # is fixed at first-JVM-launch — size it for 32 concurrent tasks.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "64g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark
