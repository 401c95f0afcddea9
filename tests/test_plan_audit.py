"""plans.audit: the audit must read real plans correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.plans.audit import assert_scalable, audit

SF_DIR = "/root/testdata/sf0.001"


def test_audit_counts_joins_and_scans(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    a = audit(df, execute=True)
    assert a.n_broadcast_joins == 2
    assert a.n_cartesian == 0
    assert len(a.scans) == 3
    assert a.n_codegen_spans > 0  # AQE final plan fuses codegen spans
    assert_scalable(df)  # no red flags


def test_audit_flags_cartesian(spark):
    a = spark.range(10)
    b = spark.range(10)
    cross = a.crossJoin(b)
    got = audit(cross)
    assert got.n_cartesian == 1
    with pytest.raises(AssertionError, match="cartesian"):
        assert_scalable(cross)


def test_audit_sees_python_stages(spark):
    from cs533_big_data_data_mining_spark.operators.cells import GridSpec, ghost_expand
    from cs533_big_data_data_mining_spark.operators.neighbors import neighbor_counts

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.col("embedding")[j].cast("double") for j in range(3)]).alias("xs"),
    )
    spec = GridSpec(eps=0.06, dims=(0,), origin=(-0.6,), width=(0.3,), ncells=(4,))
    counts = neighbor_counts(ghost_expand(pts, spec), 0.06)
    a = audit(counts)
    assert a.n_python_stages >= 1
    assert_scalable(counts)


def test_audit_sweep_over_query_surface(spark):
    """assert_scalable over every lazily-planned driver query: no
    cartesian products, no unpruned wide scans — mechanically, for
    the whole SQL-expressible surface (eager harness queries that
    return driver-built frames are skipped; quantile_filter's 1-row
    threshold crossJoin is a benign BroadcastNestedLoopJoin and is
    audited for its OTHER red flags)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_audit", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()

    lazy = [
        "scan_project_filter", "bbox", "median_dim", "grid_cells", "ghost_rows",
        "agg_q1", "join_revenue_by_nation", "window_topk", "rollup_revenue",
        "profile_lineitem", "expectations", "dedup_exact", "text_stats", "tfidf",
        "simhash_sigs", "simhash_neardup", "repetition_stats", "balance_sources",
        "decontaminate", "asof_purchase_click", "redact_pii", "multimodal_meta",
        "multimodal_frames", "sessionize", "stream_windowed_counts",
        "dedup_ngram_jaccard", "dedup_minhash", "dedup_minhash_2t",
        "paragraph_dedup",
    ]
    for name in lazy:
        df = qs[name](spark, SF_DIR)
        assert_scalable(df)

    # benign nested-loop joins by design: the 1-row quantile threshold
    # broadcast, block-pair fan-outs over KB-scale packed frames, and
    # brute-force top-k, which IS a broadcast nested loop of a small
    # query set against the corpus (the scale path is sim_topk_ivf)
    benign_bnlj = ["quantile_filter", "embed_neardup", "sim_topk"]
    for name in benign_bnlj:
        a = audit(qs[name](spark, SF_DIR))
        flags = [f for f in a.red_flags if "cartesian" not in f and "nested-loop" not in f]
        assert not flags, f"{name}: {flags}"


def test_bpe_join_route_single_pretokenize_pass(spark):
    """The join-route counter's physical plan must pretokenize the
    corpus ONCE: the distinct-word branch reads the cached
    per-(doc, word) aggregate (InMemoryRelation), not a second scan +
    Arrow pass over the raw text — exactly 2 ArrowEvalPython nodes
    (pretokenize, per-word encode) and no cartesian."""
    from cs533_big_data_data_mining_spark.operators.bpe import (
        bpe_doc_token_counts,
        bpe_train,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = bpe_train(docs, "text", 4)
    caches = []
    out = bpe_doc_token_counts(docs, merges, route="join", caches=caches)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # both consumers of the diamond (distinct-word branch, final sum)
    # must read the CACHED per-(doc, word) aggregate — two
    # InMemoryTableScan references = the pretokenize pass runs once
    # (the explain text repeats the cached subplan inside each
    # InMemoryRelation, so node-string counting would be misleading)
    assert plan.count("InMemoryTableScan") >= 2, plan
    a = audit(out)
    assert a.n_cartesian == 0
    for c in caches:
        c.unpersist()


def test_phash_plan_no_cartesian(spark):
    """phash pairing must be a band equi-join (never all-pairs)."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        pack_ppm,
        phash_neardup_pairs,
    )
    from cs533_big_data_data_mining_spark.session import local_df

    rows = [
        (i, bytearray(pack_ppm(np.full((8, 9, 3), 10 * (i % 20), dtype=np.uint8))))
        for i in range(30)
    ]
    media = local_df(spark, rows, "media_id long, payload binary")
    caches = []
    out = phash_neardup_pairs(media, caches=caches)
    a = audit(out)
    assert a.n_cartesian == 0
    assert a.n_python_stages >= 1  # the dhash decode kernel
    for c in caches:
        c.unpersist()
