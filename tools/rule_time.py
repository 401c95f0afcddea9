"""Catalyst rule-time attribution for a declared query (guide §1/§7.3).

Usage: python3 tools/rule_time.py <sf_dir> <query> [runs]

Runs the query, then prints RuleExecutor.dumpTimeSpent() — cumulative
driver time per analyzer/optimizer rule — so a planning-bound query
(jobs idle, driver busy) can be attributed to the rule that churns.
Metrics are reset after the warm-up run, so the report covers only
the measured run.
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
    name = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mod = load_entry()
    fn = mod.queries()[name]
    spark = get_spark(
        app_name=f"rule_time_{name}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    rex = spark._jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor
    for r in range(runs):
        rex.resetMetrics()
        t0 = time.time()
        fn(spark, sf_dir).count()
        wall = time.time() - t0
        dump = rex.dumpTimeSpent()
        lines = [ln for ln in dump.splitlines() if ln.strip()]
        # keep header + top rules by effective time
        print(f"\n=== run {r}: wall {wall:.3f}s ===")
        for ln in lines[:40]:
            print(ln)
    spark.stop()


if __name__ == "__main__":
    main()
