"""Unit tests for the r5 wave-2 operators: sparse retrieval (BM25,
inverted index), blocked fuzzy linkage, SCD2/CDC temporal ops, the
data-quality report, and semantic dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.ext import retrieval as R
from scripts_toolkit_spark.ext import similarity as SIM
from scripts_toolkit_spark.operators.checks import completeness, quality_report, uniqueness
from scripts_toolkit_spark.operators.linkage import blocked_levenshtein_join
from scripts_toolkit_spark.operators.spans import apply_changelog, scd2_intervals


# ----------------------------------------------------------------- retrieval
def test_bm25_ranks_denser_match_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r["score"] for r in R.bm25_scores(docs, ["spark"]).collect()}
    assert 3 not in rows  # no query term, no score row
    assert rows[1] > rows[2] > 0.0


def test_bm25_idf_favors_rarer_term(spark):
    docs = spark.createDataFrame(
        [(1, "rare common"), (2, "common x"), (3, "common y"), (4, "z common")],
        "doc_id bigint, text string",
    )
    scores = {r["doc_id"]: r["score"] for r in R.bm25_scores(docs, ["rare", "common"]).collect()}
    # doc 1 holds the rare term (plus common) → strictly highest
    assert scores[1] > max(v for k, v in scores.items() if k != 1)


def test_bm25_length_normalization(spark):
    # same tf, longer doc → lower score (b > 0)
    docs = spark.createDataFrame(
        [(1, "spark a"), (2, "spark " + " ".join(["pad"] * 30))],
        "doc_id bigint, text string",
    )
    scores = {r["doc_id"]: r["score"] for r in R.bm25_scores(docs, ["spark"]).collect()}
    assert scores[1] > scores[2]


def test_inverted_index_postings_exact(spark):
    docs = spark.createDataFrame(
        [(10, "a b a"), (2, "a c"), (7, "b b")], "doc_id bigint, text string"
    )
    out = {r["token"]: r for r in R.inverted_index(docs, postings_cap=2).collect()}
    assert out["a"]["doc_freq"] == 2 and out["a"]["total_tf"] == 3
    assert out["a"]["postings_prefix"] == "2,10"  # sorted ascending
    assert out["b"]["doc_freq"] == 2 and out["b"]["total_tf"] == 3
    assert out["c"]["postings_prefix"] == "2"


# ------------------------------------------------------------------- linkage
def test_blocked_levenshtein_join_finds_typo_and_stays_equi(spark):
    left = spark.createDataFrame(
        [("acme corp", "corp"), ("zeta ltd", "ltd")], "name_a string, blk_a string"
    )
    right = spark.createDataFrame(
        [("acme! corp", "corp"), ("beta ltd", "ltd"), ("acme corpXXXX", "corp")],
        "name_b string, blk_b string",
    )
    out = blocked_levenshtein_join(
        left, right, "name_a", "name_b", [(F.col("blk_a"), F.col("blk_b"))], max_dist=2
    )
    got = {(r["name_a"], r["name_b"], r["lev_dist"]) for r in out.collect()}
    # typo caught at distance 1; length-band pruned the 4-char-longer name;
    # cross-block 'beta ltd' vs 'zeta ltd' IS within the same block (ltd)
    # at distance 1 — included by design
    assert ("acme corp", "acme! corp", 1) in got
    assert all(n != "acme corpXXXX" for _, n, _d in got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------------------ temporal
def test_scd2_intervals_runs(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "A"), (1, 2, "A"), (1, 3, "B"), (1, 4, "A"),
            (2, 1, "X"),
        ],
        "k bigint, t bigint, v string",
    )
    out = {
        (r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["n_rows"])
        for r in scd2_intervals(df, "k", F.col("v"), ["t"], "t").collect()
    }
    assert out[(1, 1)] == ("A", 1, 2, 2)
    assert out[(1, 2)] == ("B", 3, 3, 1)
    assert out[(1, 3)] == ("A", 4, 4, 1)  # value returning opens a NEW run
    assert out[(2, 1)] == ("X", 1, 1, 1)


def test_apply_changelog_latest_wins_and_delete(spark):
    df = spark.createDataFrame(
        [
            (1, 1, "I", 10.0), (1, 2, "U", 20.0),          # survives with v=20
            (2, 1, "I", 1.0), (2, 2, "D", 0.0),            # deleted
            (3, 1, "D", 0.0), (3, 2, "I", 5.0),            # re-inserted after delete
        ],
        "k bigint, t bigint, o string, v double",
    )
    out = {r["k"]: (r["last_op"], r["v"], r["n_ops"]) for r in
           apply_changelog(df, "k", F.col("o"), ["t"]).collect()}
    assert out[1] == ("U", 20.0, 2)
    assert 2 not in out
    assert out[3] == ("I", 5.0, 2)


# ------------------------------------------------------------- quality report
def test_quality_report_metrics(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (4, "z")], "id bigint, s string"
    )
    rep = {
        r["check_name"]: (r["metric"], r["passed"])
        for r in quality_report(
            df,
            "t",
            [
                ("rows", F.count(F.lit(1)), lambda m: m == 4.0),
                ("id_unique", uniqueness("id"), lambda m: m == 1.0),
                ("s_complete", completeness("s"), lambda m: m == 1.0),
            ],
        ).collect()
    }
    assert rep["rows"] == (4.0, True)
    assert rep["id_unique"] == (0.75, False)  # 3 distinct / 4 rows
    assert rep["s_complete"] == (0.75, False)


def test_quality_report_is_single_scan(spark):
    df = spark.range(10).withColumn("s", F.col("id").cast("string"))
    rep = quality_report(df, "t", [("rows", F.count(F.lit(1)), lambda m: m > 0),
                                   ("u", uniqueness("s"), lambda m: m == 1.0)])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one aggregate chain, no join of per-check subplans
    assert "Join" not in plan


# ------------------------------------------------------------- semantic dedup
def test_semantic_dedup_drops_planted_duplicates(spark):
    import random

    rng = random.Random(7)
    base = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    # plant exact duplicates of vectors 0..4 with higher ids
    dups = [(100 + i, list(base[i][1])) for i in range(5)]
    vecs = spark.createDataFrame(base + dups, "vec_id bigint, embedding array<double>")
    dropped = SIM.semantic_dedup(vecs, n_cells=4, tau=0.999)
    got = {r["vec_id"]: r["keeper_id"] for r in dropped.collect()}
    # every planted dup must be dropped in favor of its lower-id original
    # (an exact copy always lands in the same nearest cell)
    for i in range(5):
        assert got.get(100 + i) == i
    # originals never appear as drops of their own copies (keeper < dropped)
    assert all(k < d for d, k in got.items())
    plan = dropped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def _in_cell_pair_volume(cells_df) -> int:
    """Σ C(c,2) over (cell_id, sub_id) groups = candidate pairs the
    semantic_dedup equi-join will produce before the τ filter."""
    rows = cells_df.groupBy("cell_id", "sub_id").agg(F.count(F.lit(1)).alias("c")).collect()
    return sum(r["c"] * (r["c"] - 1) // 2 for r in rows)


def test_semantic_cells_candidate_volume_stays_linear(spark):
    """Constant-occupancy guard (r6 verdict "Next round" #1): on random
    vectors, 4× the corpus must give ~4× (not 8×) the in-cell candidate
    pairs. The pre-r7 √N sizing gives pairs ≈ N^1.5/2, i.e. an 8× jump
    for a 4× corpus; constant target occupancy gives ≈ N·target/2, a 4×
    jump. Assert ≤ 6× — cleanly between the two regimes."""
    import random

    rng = random.Random(42)

    def corpus(n):
        rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(n)]
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    v_small = _in_cell_pair_volume(SIM.semantic_cells(corpus(1000)))
    v_big = _in_cell_pair_volume(SIM.semantic_cells(corpus(4000)))
    assert v_small > 0
    assert v_big <= 6 * v_small, f"{v_big} vs {v_small}: superlinear candidate growth"


def test_semantic_cells_split_bounds_skewed_cell(spark):
    """Worst-case bound: a degenerate corpus whose vectors all share one
    nearest centroid must be md5-sub-split so no (cell, sub) group exceeds
    ~split_factor·target occupants — pair volume stays bounded under skew."""
    # near-identical vectors (tiny jitter on one element): one dominant cell
    rows = [(i, [1.0 + i * 1e-9, 0.0, 0.0, 0.0]) for i in range(600)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cells = SIM.semantic_cells(vecs, n_cells=4, target_cell_size=64, split_factor=4)
    sizes = [
        r["c"]
        for r in cells.groupBy("cell_id", "sub_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert max(sizes) < 600, "oversized cell was not sub-split"
    # md5 spread is uneven but every sub-cell must be far below the raw cell
    assert max(sizes) <= 4 * 64


def test_semantic_dedup_default_sizing_still_catches_planted_dups(spark):
    """The constant-occupancy default path (n_cells=None) must keep exact
    copies co-celled and dropped — recall does not depend on cell count."""
    import random

    rng = random.Random(11)
    base = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(200)]
    dups = [(1000 + i, list(base[i][1])) for i in range(10)]
    vecs = spark.createDataFrame(base + dups, "vec_id bigint, embedding array<double>")
    got = {
        r["vec_id"]: r["keeper_id"]
        for r in SIM.semantic_dedup(vecs, n_cells=None, tau=0.999).collect()
    }
    for i in range(10):
        assert got.get(1000 + i) == i


def test_image_dhash_pairs_cover_planted_dups_no_cartesian(spark, sf_dir):
    from scripts_toolkit_spark.plans.ext_demos2 import image_dhash_near_dups

    out = image_dhash_near_dups(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # every planted (base, base+1e6) perceptual dup must be recovered:
    # measured dHash drift <= 3 bits, pairing verifies Hamming <= 6 with
    # recall 1.0 by the multi-block pigeonhole
    from scripts_toolkit_spark.io.catalog import load_table
    from pyspark.sql import functions as F

    base_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % 5 == 0)
        .select("vec_id")
        .collect()
    }
    expected_planted = {(i, i + 1000000) for i in base_ids}
    assert expected_planted <= pairs


def test_asof_forward_direction(spark):
    from scripts_toolkit_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10), (1, 25), (2, 5)], "k bigint, ts bigint")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 1, "z")], "k bigint, ts bigint, v string"
    )
    out = {
        (r["k"], r["ts"]): r["v_asof"]
        for r in asof_join(left, right, key="k", right_cols=("v",), direction="forward").collect()
    }
    # ties match (ts=10 → 'a'); next-at-or-after otherwise; none after → NULL
    assert out == {(1, 10): "a", (1, 25): "c", (2, 5): None}
    # bounded look-ahead: tolerance discards a match too far in the future
    out2 = {
        (r["k"], r["ts"]): r["v_asof"]
        for r in asof_join(
            left.withColumn("ts", F.timestamp_micros(F.col("ts") * 1000000)),
            right.withColumn("ts", F.timestamp_micros(F.col("ts") * 1000000)),
            key="k",
            right_cols=("v",),
            direction="forward",
            tolerance="3 SECONDS",
        ).collect()
    }
    assert [v for (_k, _t), v in sorted(out2.items())] == ["a", None, None]


def test_audio_fingerprint_pairs_cover_planted_dups(spark, sf_dir):
    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.plans.ext_demos2 import audio_fingerprint_near_dups

    out = audio_fingerprint_near_dups(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    base_ids = {
        r["vec_id"]
        for r in load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % 5 == 0)
        .select("vec_id")
        .collect()
    }
    assert {(i, i + 1000000) for i in base_ids} <= pairs


def test_hybrid_rrf_fusion_invariants(spark, sf_dir):
    """RRF semantics: every emitted score equals 1/(60+lex)+1/(60+dense)
    (missing leg contributes 0) re-derived from the emitted ranks; ranks
    are rrf-descending per query; and the fusion genuinely uses BOTH legs
    (some fused row carries only a lex rank, some only a dense rank,
    some both — at every SF)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["hybrid_rrf_search"](spark, sf_dir).collect()
    assert rows
    both = lex_only = dense_only = 0
    by_q: dict = {}
    for r in rows:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (60 + r["lex_rank"])
        if r["dense_rank"] is not None:
            expect += 1.0 / (60 + r["dense_rank"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9, r
        if r["lex_rank"] is not None and r["dense_rank"] is not None:
            both += 1
        elif r["lex_rank"] is not None:
            lex_only += 1
        else:
            dense_only += 1
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["rrf_score"]))
    assert lex_only and dense_only, (lex_only, dense_only, both)
    for _q, rs in by_q.items():
        rs.sort()
        scores = [s for _, s in rs]
        assert scores == sorted(scores, reverse=True)
