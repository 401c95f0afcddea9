"""Stress the pack_sequences determinism question (round-5 verdict #1).

Repeats the driver's spark-vs-DuckDB compare N times in ONE session
(the driver gate's shape), with validate=True so any internal offset
divergence raises, and interleaves adversarial bound sets (empty, a
single mid bound, duplicated bounds, off-by-one at id edges, bounds
outside the id range) proving result invariance to the one external
sketch input.

Usage: python3 tools/stress_pack.py [n_iters] [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from tools.check_entry import canon, compare, load_entry  # noqa: E402

from cs533_big_data_data_mining_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    mod = load_entry()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    oracle_pdf = con.sql(mod.oracle_sql()["pack_sequences"]).df()

    spark = get_spark(app_name="stress_pack")
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators import packing

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).head()
    adversarial = [
        [],  # one bucket
        [(lo + hi) / 2],  # single mid split
        [lo, lo, hi, hi],  # duplicated + edges (dedup'd inside)
        [lo - 1, hi + 1],  # outside the range (empty edge buckets)
        [lo, lo + 1, hi - 1, hi],  # off-by-one at id boundaries
        list(range(int(lo), int(hi), max(1, (int(hi) - int(lo)) // 97))),  # many tiny buckets
    ]
    fails = 0
    for i in range(n):
        bounds = adversarial[i % len(adversarial)] if i % 2 else None
        got = packing.pack_sequences(
            docs, "doc_id", mod.PACK_SEQ_LEN, bounds=bounds, validate=True
        ).toPandas()
        ok = compare(f"iter{i} bounds={'sketch' if bounds is None else bounds[:4]}", got, oracle_pdf)
        same = canon(got).equals(canon(oracle_pdf))
        if not (ok and same):
            fails += 1
            print(f"ITER {i} FAIL (bounds={bounds}, sketch_used={packing.LAST_BOUNDS})")
        else:
            print(f"iter {i}: OK ({'sketch ' + str(len(packing.LAST_BOUNDS)) + ' bounds' if bounds is None else 'adversarial'})")
    print(f"\n{n - fails}/{n} bit-exact")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
