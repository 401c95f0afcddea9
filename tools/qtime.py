"""Time individual declared queries cold+warm in one fresh session.

Usage: python3 tools/qtime.py <sf_dir> <runs> <query ...>

Prints per-run wall seconds bracketed by the bench's canary probe so a
host-throttle window is visible per reading. Mirrors bench.py's timed
action (``.count()``).
"""

from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from cs533_big_data_data_mining_spark.session import get_spark  # noqa: E402


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2])
    names = sys.argv[3:]
    mod = load_entry()
    qs = mod.queries()
    spark = get_spark(
        app_name="qtime", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    from pyspark.sql import functions as F

    canary_q = (
        spark.range(0, 320_000_000, 1, 32)
        .select((F.xxhash64("id") % 997).alias("h"))
        .groupBy()
        .sum("h")
    )

    def probe():
        t0 = time.time()
        canary_q.head()
        return time.time() - t0

    # warm like bench.py
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(c):
        return c

    spark.range(0, 10_000, 1, 32).select(_warm(F.col("id"))).count()
    cmin = min(probe() for _ in range(3))
    print(f"canary_min {cmin:.3f}")

    for name in names:
        fn = qs[name]
        for i in range(runs):
            cb = probe()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            ca = probe()
            print(
                f"{name} run{i}: {dt:.3f}s rows={n} "
                f"canary=[{cb / cmin:.2f},{ca / cmin:.2f}]",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
