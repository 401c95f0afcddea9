"""Benchmark harness — one JSON line to stdout.

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR``
(default /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``, plus
the reference repo's own headline dataset (clus50k.bin, 50k x 10-D,
eps=25 minPts=5 — BASELINE.md: 19.6 s on 2 cores, validated output
46914/3086/51) when present.

Output: {"metric": "total_runtime", "value": N, "unit": "sec",
         "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cs533_big_data_data_mining_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REFERENCE_BIN = "/root/reference/clus50k.bin"


def _entry_module():
    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location("spark_entry", os.path.join(here, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def bench_clus50k(spark):
    """The reference baseline workload: full DBSCAN on clus50k.bin."""
    from cs533_big_data_data_mining_spark import dbscan, dbscan_stats, read_points_bin

    pts = read_points_bin(spark, REFERENCE_BIN).repartition(32).cache()
    pts.count()
    t0 = time.time()
    stats = dbscan_stats(dbscan(pts, eps=25.0, min_pts=5)).head()
    dt = time.time() - t0
    assert stats["n_clusters"] == 51 and stats["noise_count"] == 3086, f"clus50k wrong: {stats}"
    pts.unpersist()
    return dt


def main() -> None:
    mod = _entry_module()
    qs = mod.queries()
    spark = get_spark(app_name="cs533_bench")

    # warm the JVM/Python-worker pools so per-query times measure the
    # queries, not session spin-up
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    if os.path.exists(REFERENCE_BIN):
        t0 = time.time()
        bench_clus50k(spark)
        timings["dbscan_clus50k_ref"] = round(time.time() - t0, 3)
        print(f"# dbscan_clus50k_ref: {timings['dbscan_clus50k_ref']}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "total_runtime", "value": total, "unit": "sec", "queries": timings, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
