"""Canonical SparkSession construction and session-conf hygiene.

Two confs are CORRECTNESS-critical (SURVEY.md §0.2, verified):

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — some fixture
  generations store events.ts as timestamp[ns]; Spark 4.1.2 hard-errors
  on such files otherwise (harmless when the fixture is timestamp[us]).
- ``spark.sql.session.timeZone=UTC`` — collected timestamps must be
  tz-naive-equal to the DuckDB oracle's.

The rest is local-mode performance hygiene. ``apply_session_conf`` is
runtime-safe (all SQL confs) and is applied defensively at the top of
every registered query, because the driver may call queries() with a
session we did not build.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to ANY session before our queries run.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime partition coalescing + skew-join splitting; this is the
    # 100 TB story (plans re-size at every shuffle boundary from real stats).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def apply_session_conf(spark: SparkSession) -> SparkSession:
    """Set runtime SQL confs on an existing session (driver-provided or ours).

    Shuffle partitions: sized to local cores, not the 200 default — at
    bench scale (sf0.1) 200 tiny partitions burn scheduling time; on a
    real cluster this would be sized to ~2-3× total executor cores and
    AQE coalescing handles the rest.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — get_spark() sets it at build time
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(_default_parallelism()))
    except Exception:
        pass
    return spark


def get_spark(app_name: str = "hja-spark", master: str | None = None) -> SparkSession:
    """Build the engine's own session (tests, bench, CLI use)."""
    cpus = _default_parallelism()
    master = master or os.environ.get("HJA_MASTER", f"local[{cpus}]")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("HJA_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_session_conf(spark)
