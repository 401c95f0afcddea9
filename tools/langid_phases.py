"""Phase breakdown of langid_route_eq (measurement only, guide §1).

Usage: python3 tools/langid_phases.py <sf_dir> [runs]

Splits the query's wall time into: construct+fit plan, fit.collect,
model local_df, scoring plan build, and the terminal .count(), so the
optimization targets the phase that actually costs (driver planning vs
executor compute vs Python boundary).
"""

from __future__ import annotations

import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from cs533_big_data_data_mining_spark.session import get_spark, local_df  # noqa: E402


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    m = load_entry()
    spark = get_spark(
        app_name="langid_phases",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from cs533_big_data_data_mining_spark.operators.classify import (
        lang_id_nb,
        langid_train,
    )
    from cs533_big_data_data_mining_spark.functions.text import lang_id

    for r in range(runs):
        t = {}
        t0 = time.time()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", m._langid_eq_text().alias("text")
        )
        caches: list = []
        fit = langid_train(
            docs.filter(F.col("doc_id") % 3 == 0),
            "text",
            n_buckets=m.LANGID_EQ_B,
            alpha=m.LANGID_EQ_ALPHA,
            max_n=m.LANGID_EQ_MAX_N,
            caches=caches,
        )
        t["fit_build"] = time.time() - t0

        t0 = time.time()
        rows = fit.collect()
        t["fit_collect"] = time.time() - t0

        t0 = time.time()
        model = local_df(
            spark,
            [(x["label"], x["b"], x["llh"]) for x in rows],
            "label string, b long, llh double",
        )
        for fr in caches:
            fr.unpersist()
        t["model_localdf"] = time.time() - t0

        t0 = time.time()
        i = F.col("doc_id")
        scored = m._spread(docs).select(
            i.alias("id"),
            lang_id("text").alias("lang_marker"),
            F.when(i % 5 == 0, lang_id_nb(model, "text", impl="column"))
            .otherwise(lang_id_nb(model, "text", impl="arrow"))
            .alias("lang_nb"),
            lang_id_nb(model, "text", impl="arrow").alias("lang_nb_fast"),
        )
        out = scored.repartition(
            scored.sparkSession.sparkContext.defaultParallelism
        ).select("*", (F.col("lang_marker") == F.col("lang_nb")).alias("agree"))
        t["score_build"] = time.time() - t0

        t0 = time.time()
        n = out.count()
        t["count"] = time.time() - t0

        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        t["noop_save"] = time.time() - t0

        total = sum(t.values())
        print(f"run {r}: total={total:.2f}s n={n} " + " ".join(f"{k}={v:.2f}" for k, v in t.items()))


main()
