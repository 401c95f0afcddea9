"""SparkSession factory with scale-appropriate defaults.

Local mode is the test harness; the conf is written so the same code
runs unchanged on a multi-executor cluster (AQE, Arrow, sensible
shuffle partitioning). Nothing here is local-mode-specific except the
master URL, which callers override in production.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so ``addPyFile`` can ship it to executors.

    Local mode spawns Python workers from the JVM, and on a real
    cluster executors live on other hosts — either way the package
    must travel with the session, not rely on the driver's cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(tempfile.gettempdir(), "cs533_big_data_data_mining_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_STORED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return out


def _local_dir() -> str:
    """Scratch dir for shuffle/spill files — tmpfs if present."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        d = os.path.join(shm, "spark-local")
        os.makedirs(d, exist_ok=True)
        return d
    return tempfile.gettempdir()


def get_spark(
    app_name: str = "cs533_spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE is on so skewed cells / small shuffles re-plan at runtime;
    Arrow is on because every custom kernel is a Pandas UDF.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    # one task wave per stage: AQE splits genuinely large partitions
    # (skew join) and coalesces small ones, so over-provisioning the
    # initial count only adds scheduling overhead per reduce stage
    shuffle_partitions = shuffle_partitions or max(cpus, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # shuffle/spill files: executor threads serialize on shuffle
        # index-file commits, so a slow local disk stalls every map
        # stage (threads sit BLOCKED in writeMetadataFileAndCommit).
        # Use memory-backed storage when available; on a real cluster
        # point SPARK_GRAFT_LOCAL_DIR at the fast local SSDs.
        .config("spark.local.dir", _local_dir())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's events table carries TIMESTAMP(NANOS) parquet
        # timestamps, which vanilla Spark rejects; read them as longs
        # and convert explicitly (streaming/events.load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # AQE posts a full plan DESCRIPTION string to the listener bus
        # on every re-optimization; for queries with large expression
        # trees the driver burned ~70 s CPU in Expression.toString per
        # fit (jstack: AdaptiveSparkPlanExec -> BinaryOperator.toString).
        # 256 KB keeps explain() complete for every sane plan while
        # bounding the stringification of pathological ones (display
        # only — no effect on results).
        .config("spark.sql.maxPlanStringLength", str(256 * 1024))
        # Whole-stage-codegen class cache (default 100 entries, LRU,
        # one static cache per JVM). This engine's plans are literal-
        # specialized and composite queries compile ~80 codegen units
        # each (measured: fineweb_pipeline), so a driver session that
        # runs many distinct queries — the bench's ~190 runs, or a
        # production driver looping over curation configs — evicts a
        # composite's units long before its next run and pays the full
        # multi-second recompile again (measured via CodegenMetrics:
        # re-run after 10 intervening queries recompiled 70/85 units,
        # 9.5 s vs 7.4 s with 1 recompile at 4096; in a full bench
        # session the same re-run read 49 s). 4096 entries covers the
        # whole registry (~101 queries x ~20 units) with headroom;
        # cost is driver-heap class metadata (~100 KB/entry worst
        # case, ~400 MB bound on a 32 GB driver). Not a result-bearing
        # setting — purely compile-cache sizing for long sessions.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addPyFile(_package_zip())
    return spark


def local_df(spark: SparkSession, rows, schema: str):
    """Driver-built small DataFrame through the **Arrow** path.

    ``spark.createDataFrame(list_of_tuples)`` routes through the
    pickled-RDD path with ``defaultParallelism`` partitions, and every
    ACTION that touches the frame pays one Python-worker round trip
    per partition — measured 17 s for a 4-way crossJoin of four
    one-row frames on local[32] (1024 cartesian tasks of Python
    partitions), and a recurring tax on every broadcast-joined
    driver-built side table (partition offsets, centroids, block
    maps). Routing the same rows through a pandas frame makes the
    result JVM-backed Arrow batches: the same crossJoin is 0.2 s and
    actions never touch Python again.

    ``schema`` is the usual DDL string; pandas holds the rows only as
    a transit format (dtypes are coerced by the schema). Falls back
    to Spark's own non-Arrow conversion semantics automatically if
    Arrow can't encode a value (Spark warns and converts).
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    names = [f.name for f in StructType.fromDDL(schema).fields]
    pdf = pd.DataFrame.from_records(list(rows), columns=names)
    return spark.createDataFrame(pdf, schema=schema)


def observation_value(obs, name: str, default=None):
    """Prune-safe read of a ``pyspark.sql.Observation`` metric AFTER
    the observed dataset's action completed.

    ``Observation.get`` assumes the observe node executed; when AQE's
    empty-relation propagation collapses a downstream branch (e.g. a
    left-semi join whose keep set is empty at runtime), the
    CollectMetrics node is pruned from the executed plan and ``get``
    raises ``java.lang.AssertionError`` from ``toPyRow`` (the JVM's
    ``getRowOrEmpty`` yields an EMPTY row). Returns ``default`` in
    that case instead of crashing — the metric is genuinely unknown,
    not zero."""
    jo = getattr(obs, "_jo", None)
    if jo is None:
        return default
    try:
        opt = jo.getRowOrEmpty()
        if not opt.isDefined():
            return default
        row = opt.get()
        if row.size() == 0:
            return default
        return row.get(row.fieldIndex(name))
    except Exception:  # noqa: BLE001 — py4j surface; degrade to default
        return default
