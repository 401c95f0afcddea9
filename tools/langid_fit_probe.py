"""Isolate the langid_train fit: where do the seconds go? (guide §1, §7.3)

Usage: python3 tools/langid_fit_probe.py <sf_dir>

Times: expression build, .collect() — and samples the driver JVM stack
mid-collect so we can tell executor compute from driver planning.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import threading
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


def jstack_sample(tag, delay):
    def run():
        time.sleep(delay)
        # find the JVM pid (child of this python)
        out = subprocess.run(
            ["pgrep", "-f", "org.apache.spark.deploy.SparkSubmit"],
            capture_output=True, text=True,
        ).stdout.split()
        if not out:
            print(f"[{tag}] no JVM found")
            return
        pid = out[0]
        d = subprocess.run(["jstack", pid], capture_output=True, text=True).stdout
        open(f"/tmp/jstack_{tag}.txt", "w").write(d)
        print(f"[{tag}] jstack written ({len(d)} bytes)")

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def main():
    sf_dir = sys.argv[1]
    m = load_entry()
    spark = get_spark(
        app_name="langid_fit_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F
    from cs533_big_data_data_mining_spark.operators.classify import langid_train

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", m._langid_eq_text().alias("text")
    )
    t0 = time.time()
    caches: list = []
    fit = langid_train(
        docs.filter(F.col("doc_id") % 3 == 0),
        "text",
        n_buckets=m.LANGID_EQ_B,
        alpha=m.LANGID_EQ_ALPHA,
        max_n=m.LANGID_EQ_MAX_N,
        caches=caches,
    )
    t_build = time.time() - t0
    print(f"build={t_build:.2f}s")

    for tag, delay in [("a", 20), ("b", 60), ("c", 120)]:
        jstack_sample(tag, delay)
    t0 = time.time()
    rows = fit.collect()
    t_collect = time.time() - t0
    print(f"collect={t_collect:.2f}s rows={len(rows)}")


main()
