"""Cluster-operator toolkit (plans/scale_demos.py): plan-shape and property
tests for the pre-flight diagnostics — the SCALE claims each docstring makes
must be mechanically pinned, not just asserted in prose."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.plans import scale_demos as sd


def test_token_budget_prefix_sum_is_bucket_partitioned(spark, sf_dir):
    """The N-sized running-sum window must partition on the bucket key —
    a bare global window would serialize the corpus through one task. The
    only unpartitioned window allowed is the 256-row offsets frame (its
    input is the post-aggregate bucket-total frame, bounded by fanout)."""
    import re

    df = sd.token_budget_sample(spark, sf_dir)
    ana = df._jdf.queryExecution().analyzed().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*", ana)
    # exactly two windows: the N-sized running sum PARTITIONED on bucket
    # (spec = "bucket#n, pri#m ASC ..." — partition key first, unordered),
    # and the 256-row offsets window (r13: partitioned by the lit(0)
    # intent marker — spec "0, bucket#n ASC" — bounded by the bucket
    # fanout, never by N)
    assert len(specs) == 2, specs
    assert any(re.match(r"windowspecdefinition\(bucket#\d+, pri#", s) for s in specs), specs
    assert any(re.match(r"windowspecdefinition\(0, bucket#\d+ ASC", s) for s in specs), specs
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_token_budget_sample_matches_single_window(spark, sf_dir):
    """Bucketed prefix sum == the naive single-window plan (the docstring's
    'identical for any input distribution' claim), and the selection is a
    strict, non-empty subset of the corpus."""
    from scripts_toolkit_spark.io.catalog import load_table
    from pyspark.sql.window import Window

    got = {
        (r["doc_id"], r["n_tokens"], r["cum_before"])
        for r in sd.token_budget_sample(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    w = Window.orderBy("pri", "doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = d.select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint").alias("cum_before"),
    ).where(F.col("cum_before") < sd._TOKEN_BUDGET)
    want = {(r["doc_id"], r["n_tokens"], r["cum_before"]) for r in naive.collect()}
    assert got == want
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert 0 < len(got) < n_docs


def test_zorder_layout_beats_hash_layout(spark, sf_dir):
    """The point of the z-order demo: contiguous z-ranges must give strictly
    tighter per-file min/max spans than the hash layout on BOTH dimensions
    (this is the data-skipping win the docstring promises)."""
    rows = {r["layout"]: r for r in sd.zorder_layout_stats(spark, sf_dir).collect()}
    z, h = rows["zorder"], rows["hash"]
    assert z["user_span_frac"] < h["user_span_frac"]
    assert z["day_span_frac"] < h["day_span_frac"]
    assert z["n_files"] > 1


def test_join_size_probe_matches_executed_join(spark, sf_dir):
    """The degree-sum estimate IS the exact join cardinality — pin it
    against the materialized join's count."""
    from scripts_toolkit_spark.io.catalog import load_table

    row = sd.join_size_probe(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey")
    actual = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert row["est_join_rows"] == actual
    assert row["matching_keys"] <= min(row["left_keys"], row["right_keys"])


def test_join_probe_recommendation_flips_across_skew_profiles(spark):
    """join_probe_decision must emit the strategy a 100 TB operator would
    actually pick, flipping across synthetic degree profiles: a
    broadcast-sized small side → 'broadcast'; two big uniform sides →
    'smj'; one corpus-dominating hot key → 'salted_smj'."""

    def deg(rows):
        return spark.createDataFrame(rows, "k long, d long")

    def rec(dl_rows, do_rows):
        dl = deg(dl_rows).withColumnRenamed("d", "d_l")
        do = deg(do_rows).withColumnRenamed("d", "d_o")
        return sd.join_probe_decision(dl, do).collect()[0]

    # small dimension side (1k rows) vs big fact side → broadcast
    small = [(k, 1) for k in range(1_000)]
    big_uniform = [(k, 300) for k in range(1_000)]
    r = rec(big_uniform, small)
    assert r["recommendation"] == "broadcast", r

    # both sides past the broadcast budget, uniform degrees → plain SMJ
    left = [(k, 101) for k in range(2_000)]   # 202k rows
    right = [(k, 51) for k in range(2_000)]   # 102k rows
    r = rec(left, right)
    assert r["recommendation"] == "smj", r
    assert r["est_join_rows"] == 2_000 * 101 * 51

    # both sides still past the broadcast budget, but one hot key
    # carries most of the output → salted
    hot_left = [(0, 101 * 1_000)] + [(k, 101) for k in range(1, 1_001)]
    hot_right = [(0, 51 * 2)] + [(k, 151) for k in range(1, 1_001)]
    r = rec(hot_left, hot_right)
    assert r["recommendation"] == "salted_smj", r
    assert r["max_key_share"] > 0.3


def test_join_probe_disjoint_keys_yields_zeros_not_nulls(spark):
    """Zero overlapping keys means the matched agg runs over an EMPTY
    join — SUM/MAX would emit NULL size estimates (round-8 advisor). The
    probe must report 0 rows / 0.0 share instead, and still recommend."""

    def deg(rows, col):
        return spark.createDataFrame(rows, "k long, d long").withColumnRenamed("d", col)

    dl = deg([(k, 5) for k in range(100)], "d_l")
    do = deg([(k, 3) for k in range(1_000, 1_100)], "d_o")
    r = sd.join_probe_decision(dl, do).collect()[0]
    assert r["est_join_rows"] == 0
    assert r["max_key_rows"] == 0
    assert r["matching_keys"] == 0
    assert r["max_key_share"] == 0.0
    assert r["recommendation"] == "broadcast"  # both sides tiny


def test_skew_report_shares_sum_to_one(spark, sf_dir):
    """Per key, bucket row_shares partition the table: they sum to ~1 and
    n_rows sums to the table's row count."""
    from scripts_toolkit_spark.io.catalog import load_table

    rows = sd.join_key_skew_report(spark, sf_dir).collect()
    by_key: dict[str, list] = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    assert set(by_key) == {"events.user_id", "lineitem.l_orderkey", "orders.o_custkey"}
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_rows"] for r in by_key["events.user_id"]) == n_events
    for key, rs in by_key.items():
        assert abs(sum(r["row_share"] for r in rs) - 1.0) < 1e-4, key
