"""SparkSession factory with scale-oriented defaults.

The reference engine's DirectRunner executes bundles on a daemon thread
pool in one process (reference: beam/runners/direct/executor.py:39-110).
Spark's equivalent deployment knob is the master URL; everything else
here is configuration we want identical between tests, bench, and a real
cluster submit:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  replaces Beam's dynamic work rebalancing (beam/io/iobase.py:206-576).
- ``spark.sql.shuffle.partitions`` sized to cores for local runs; on a
  real cluster this should be ~2-3x total cores (AQE coalesces down).
- UTC session timezone so event-time semantics are stable across
  environments (and match the DuckDB oracle).
- Arrow enabled for the pandas-UDF exchange paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "cloud-dataflow-batch-processing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master=None`` → ``local[$SPARK_GRAFT_CPUS]`` (the driver's bench
    environment); on a cluster, pass the real master or rely on
    spark-submit.
    """
    cpus = default_parallelism()
    # Library citizenship: if a session already exists (a host
    # application, spark-submit, or a test harness owns it), do NOT
    # silently rewrite its conf with OUR defaults — builder.config on
    # an existing session mutates shared runtime SQL conf (measured:
    # cli.run() inside the local[8]/8-shuffle test session reset
    # spark.sql.shuffle.partitions to 32 for every later test,
    # shifting downstream partial-aggregate work profiles). Only
    # settings the caller EXPLICITLY asked for are applied.
    active = SparkSession.getActiveSession()
    if active is not None and active.sparkContext._jsc is None:
        # getActiveSession can hand back a STOPPED session, whose
        # conf.set raises; treat it as no session.
        active = None
    if active is not None:
        # Builder-only args cannot be applied to a live session; raise
        # rather than silently ignoring an explicit request (ADVICE r7).
        if master is not None and active.sparkContext.master != master:
            raise RuntimeError(
                f"get_spark(master={master!r}) conflicts with the active "
                f"session's master {active.sparkContext.master!r}; stop it "
                "first or omit master to adopt the active session"
            )
        if shuffle_partitions is not None:
            active.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        for k, v in (extra_conf or {}).items():
            active.conf.set(k, v)
        return active
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver-generated test parquet uses TIMESTAMP(NANOS), which
        # vanilla Spark rejects (PARQUET_TYPE_ILLEGAL); read as int64
        # nanos and convert in the loader (sources/testdata.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
