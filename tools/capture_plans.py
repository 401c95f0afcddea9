"""Capture ``.explain("formatted")`` for declared queries.

Usage: python3 tools/capture_plans.py <out_dir> [sf_dir] [query ...]

Writes ``<out_dir>/<query>.txt`` with the formatted physical plan of
each named query (default: every registered query). Queries that
materialize internally (the flagship composites return a driver-built
local frame) still produce a plan file — it shows the terminal local
scan; their interesting stage plans are captured separately by the
optimization notes.
"""

from __future__ import annotations

import importlib.util
import os
import sys

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
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    mod = load_entry()
    qs = mod.queries()
    spark = get_spark(app_name="capture_plans")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}")
    spark.stop()


if __name__ == "__main__":
    main()
