"""SparkSession factory with scale-appropriate defaults.

The reference runs eager single-node pandas (no session concept); here one
``SparkSession`` hosts the whole pipeline graph so Catalyst sees end-to-end
lineage (SURVEY.md §3 E1). Config choices target both local[N] testing and a
multi-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting) — replaces any
  hand-tuned partition counts at 100 TB.
- Arrow on — every pandas-UDF boundary is Arrow-vectorized.
- UTC session timezone — parity with the DuckDB oracle and with the
  reference's ``dt.normalize()`` midnight-UTC convention
  (reference: all-etl-pipelines/pipeline_helpers.py:213).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "data_engineering_etl_pipeline_spark",
              shuffle_partitions: str | int | None = None) -> SparkSession:
    """Build (or reuse) the engine session.

    ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
    real cluster AQE coalescing makes the initial number a ceiling, not a
    target, so a larger value (e.g. 2-3× total cores) is safe at 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert (io.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # reliable checkpoints (dedup.dedup_clusters' fault-tolerant
        # backend) write per-round snapshot files; let the ContextCleaner
        # delete them when the superseded RDD is GC'd instead of leaking
        # one snapshot per iteration into the checkpoint dir.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # A checkpoint DIR makes the reliable (replicated, executor-loss-safe)
    # backend available to iterative operators. tempdir is right for
    # local[N]; a cluster deployment should point this at durable shared
    # storage (the lake) via SPARK_GRAFT_CHECKPOINT_DIR — a lost executor
    # can then re-read the snapshot instead of killing the job.
    if spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(
            os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            or os.path.join(tempfile.gettempdir(), "spark-graft-checkpoints"))
    return spark


def shuffle_partitions(spark: SparkSession, default: int = 32) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating the 'auto'
    value AQE-managed platforms set (r5 review finding: ``int('auto')``
    crashed at plan-build time) — falls back to the cluster's default
    parallelism, then ``default``."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", str(default))
    try:
        return int(raw)
    except (TypeError, ValueError):
        try:
            return int(spark.sparkContext.defaultParallelism)
        except Exception:
            return default
