"""Sixth analytics wave: scalable order statistics and one-pass
sufficient-statistics analytics — global top-k WITHOUT a whole-input
single-partition window (operators/topk), per-group OLS trend fitting,
MAD-based robust outlier detection, and a pairwise correlation matrix —
the statistical-profiling layer a 100 TB warehouse runs beside the type
profiler.

Determinism contract: every cross-row reduction is an exact DECIMAL (or
integer) sum of decimal-cast inputs (the money columns are 2-dp by
construction — the repo-wide `_dec` discipline); closed forms are then
evaluated per-row in IEEE double from identical inputs and rounded to
6 dp. The only interpolating aggregate (exact percentile) is rounded to
6 dp before reuse, per the repo float rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.topk import global_topk

# 2024-01-01 00:00:00 UTC in microseconds — fixed literal origin so the
# regression abscissa stays small enough for exact decimal squares.
_X_ORIGIN_US = 1704067200000000


def top_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 events by value (operators/topk.global_topk): partial
    top-k inside each input partition (narrow, no shuffle), final ranking
    over the ≤ k·P survivors — the whole-input single-partition sort a
    naive Window.orderBy would plan never happens."""
    ev = load_table(spark, sf_dir, "events")
    out = global_topk(
        ev.select("event_id", "event_type", "value"),
        [F.desc("value"), F.asc("event_id")],
        k=100,
    )
    return out.select("event_id", "event_type", "value", F.col("rank").cast("int").alias("rank"))


TOP_EVENTS_BY_VALUE_SQL = """
SELECT event_id, event_type, value, CAST(rank AS INT) AS rank
FROM (
  SELECT event_id, event_type, value,
    row_number() OVER (ORDER BY value DESC, event_id ASC) AS rank
  FROM events
)
WHERE rank <= 100
"""


def _trend_sums(x_us: Column, y: Column) -> list[Column]:
    """Exact sufficient statistics for OLS: n, Σx, Σy, Σxy, Σx² — integer
    microsecond abscissa and 2-dp decimal ordinate, all sums exact."""
    xd = x_us.cast("decimal(19,0)")
    yd = y.cast("decimal(12,2)")
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    ]


def value_trend_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS trend (value vs time): slope/intercept from exact
    decimal sufficient statistics in ONE map-side-combinable aggregate
    pass — regression at warehouse scale is a groupBy, not a solver.
    Slope is reported per hour; intercept is the fit at the 2024-01-01
    origin."""
    ev = load_table(spark, sf_dir, "events")
    # ts loads as TIMESTAMP_NTZ; the session is UTC-pinned, so the cast
    # reinterprets the same wall clock as the same instant (CLAUDE.md)
    x_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(_X_ORIGIN_US)
    sums = ev.groupBy("event_type").agg(*_trend_sums(x_us, F.col("value")))
    n = F.col("n").cast("double")
    slope_us = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope_us * F.col("sx")) / n
    return sums.select(
        "event_type",
        "n",
        F.round(slope_us * F.lit(3600000000.0), 6).alias("slope_per_hour"),
        F.round(intercept, 6).alias("intercept"),
    )


VALUE_TREND_BY_EVENT_TYPE_SQL = """
WITH sums AS (
  SELECT event_type,
    COUNT(*) AS n,
    CAST(SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(19,0))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(19,0))
             * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(19,0))
             * CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(19,0))) AS DOUBLE) AS sxx
  FROM events
  GROUP BY event_type
)
SELECT event_type, n,
  round(((CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - sx * sx)) * 3600000000.0, 6) AS slope_per_hour,
  round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE), 6)
    AS intercept
FROM sums
"""


def mad_outliers_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median + MAD (median absolute
    deviation), then count values beyond 3·MAD — the z-score's
    heavy-tail-safe cousin. Exact percentiles (sort-based); each median is
    rounded to 6 dp before reuse so every downstream comparison sees the
    same bits in both engines. Three grouped passes over a 5-group frame;
    the joins are group-key equi-joins AQE broadcasts (no hints: lineage
    is SF-linear, CLAUDE.md rule)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = ev.join(med, "event_type").withColumn("adev", F.abs(F.col("value") - F.col("med")))
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad"),
        F.first("med").alias("med"),
    )
    flagged = (
        dev.drop("med")
        .join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum((F.col("adev") > F.lit(3.0) * F.col("mad")).cast("bigint")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return flagged


MAD_OUTLIERS_BY_EVENT_TYPE_SQL = """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad, any_value(med) AS med
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
  any_value(m.med) AS med,
  any_value(m.mad) AS mad,
  CAST(SUM(CASE WHEN d.adev > 3.0 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  COUNT(*) AS n
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
"""


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of (quantity, extendedprice, discount)
    in ONE aggregate pass: all nine sufficient sums ride the same
    map-side-combinable hash aggregate (one fact scan for the whole
    matrix), the closed form is per-row double math on the one-row result,
    unpivoted via a literal struct-array explode."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {"q": "l_quantity", "p": "l_extendedprice", "d": "l_discount"}
    dec = {k: F.col(v).cast("decimal(12,2)") for k, v in cols.items()}
    aggs = [F.count(F.lit(1)).alias("n")]
    for k, c in dec.items():
        aggs.append(F.sum(c).cast("double").alias(f"s_{k}"))
        aggs.append(F.sum(c * c).cast("double").alias(f"s_{k}{k}"))
    for a, b in (("q", "p"), ("q", "d"), ("p", "d")):
        aggs.append(F.sum(dec[a] * dec[b]).cast("double").alias(f"s_{a}{b}"))
    row = li.agg(*aggs)

    n = F.col("n").cast("double")

    def corr(a: str, b: str) -> Column:
        num = n * F.col(f"s_{a}{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = n * F.col(f"s_{a}{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        db = n * F.col(f"s_{b}{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return F.round(num / (F.sqrt(da) * F.sqrt(db)), 6)

    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[a]).alias("col_x"),
                F.lit(cols[b]).alias("col_y"),
                corr(a, b).alias("corr"),
            )
            for a, b in (("q", "p"), ("q", "d"), ("p", "d"))
        ]
    )
    return row.select("n", F.explode(pairs).alias("c")).select(
        "c.col_x", "c.col_y", "c.corr", "n"
    )


CORR_MATRIX_LINEITEM_SQL = """
WITH sums AS (
  SELECT COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_q,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s_qq,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_p,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_pp,
    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS s_d,
    CAST(SUM(CAST(l_discount AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS s_dd,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS s_qp,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS s_qd,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS s_pd
  FROM lineitem
)
SELECT col_x, col_y, corr, n FROM (
  SELECT n,
    'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
    round((CAST(n AS DOUBLE) * s_qp - s_q * s_p)
          / (sqrt(CAST(n AS DOUBLE) * s_qq - s_q * s_q)
           * sqrt(CAST(n AS DOUBLE) * s_pp - s_p * s_p)), 6) AS corr
  FROM sums
  UNION ALL
  SELECT n, 'l_quantity', 'l_discount',
    round((CAST(n AS DOUBLE) * s_qd - s_q * s_d)
          / (sqrt(CAST(n AS DOUBLE) * s_qq - s_q * s_q)
           * sqrt(CAST(n AS DOUBLE) * s_dd - s_d * s_d)), 6)
  FROM sums
  UNION ALL
  SELECT n, 'l_extendedprice', 'l_discount',
    round((CAST(n AS DOUBLE) * s_pd - s_p * s_d)
          / (sqrt(CAST(n AS DOUBLE) * s_pp - s_p * s_p)
           * sqrt(CAST(n AS DOUBLE) * s_dd - s_d * s_d)), 6)
  FROM sums
)
"""


def resampled_event_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per event type, a DENSE daily
    grid (sequence-explode between that type's first and last day — no
    cross join, the grid derives from the same grouped aggregate), daily
    counts/sums zero-filled via a left equi-join, and a trailing 7-day
    moving average over the gap-filled series. The window partitions by
    event_type — never a global sort; decimal day-sums keep the moving
    average order-independent."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    grid = (
        ev.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sv"), F.lit(0).cast("decimal(12,2)")).alias("sv0"),
    )
    from pyspark.sql.window import Window

    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    return filled.select(
        "event_type",
        "day",
        "n_events",
        F.col("sv0").cast("double").alias("day_value"),
        F.round(
            F.sum("sv0").over(w7).cast("double") / F.count(F.lit(1)).over(w7).cast("double"), 6
        ).alias("ma7_value"),
    )


RESAMPLED_EVENT_TIMELINE_SQL = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(value AS DECIMAL(12,2)) AS v
  FROM events
),
grid AS (
  SELECT event_type, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM ev GROUP BY event_type)
),
daily AS (
  SELECT event_type, day, COUNT(*) AS n, SUM(v) AS sv FROM ev GROUP BY event_type, day
),
filled AS (
  SELECT g.event_type, g.day,
    COALESCE(d.n, 0) AS n_events,
    COALESCE(d.sv, CAST(0 AS DECIMAL(12,2))) AS sv0
  FROM grid g LEFT JOIN daily d ON g.event_type = d.event_type AND g.day = d.day
)
SELECT event_type, day, n_events,
  CAST(sv0 AS DOUBLE) AS day_value,
  round(CAST(SUM(sv0) OVER w7 AS DOUBLE)
        / CAST(COUNT(*) OVER w7 AS DOUBLE), 6) AS ma7_value
FROM filled
WINDOW w7 AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the token frequency spectrum: rank the top-200
    tokens by count, regress ln(count) on ln(rank) with the same exact
    decimal sufficient-statistics OLS as `value_trend_by_event_type` —
    a slope near −1 is the classic natural-corpus signature, and a
    composition proof that the trend operator runs on DERIVED frames.
    lns are rounded to 6 dp before the decimal sums (repo rule); the
    top-200 ranking over the vocabulary-sized aggregate runs through the
    two-stage `global_topk` (no single-task window)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
    stats = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = global_topk(stats, [F.desc("cnt"), F.asc("token")], 200, rank_col="r")
    pts = ranked.select(
        F.round(F.log(F.col("r").cast("double")), 6).cast("decimal(12,6)").alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 6).cast("decimal(12,6)").alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n = F.col("n_tokens").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    return sums.select(
        "n_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


ZIPF_FIT_TOKENS_SQL = """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
stats AS (
  SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token ASC) AS r FROM stats
  QUALIFY r <= 200
),
pts AS (
  SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
         CAST(round(ln(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
  FROM ranked
),
sums AS (
  SELECT COUNT(*) AS n_tokens,
    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM pts
)
SELECT n_tokens,
  round((CAST(n_tokens AS DOUBLE) * sxy - sx * sy)
        / (CAST(n_tokens AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
  round((sy - ((CAST(n_tokens AS DOUBLE) * sxy - sx * sy)
               / (CAST(n_tokens AS DOUBLE) * sxx - sx * sx)) * sx)
        / CAST(n_tokens AS DOUBLE), 6) AS zipf_intercept
FROM sums
"""


def order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (§2.10 breadth beyond
    rank/lag/lead): ntile deciles, percent_rank and cume_dist of order
    value WITHIN each priority class. All three are exact integer-count
    formulas over a totally ordered partition ((price, key) tiebreak), so
    the doubles match bit-for-bit across engines; windows partition by
    priority — never a global sort."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


ORDER_VALUE_DECILES_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
  CAST(ntile(10) OVER w AS INT) AS decile,
  percent_rank() OVER w AS pct_rank,
  cume_dist() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group statistics (the robust-preprocessing step
    before training on heavy-tailed features): exact p05/p95 per
    event_type (6-dp-rounded before reuse), values CLAMPED into the band,
    then exact decimal means of raw vs winsorized values plus the clamp
    counts. Two grouped passes (percentiles, then the clamped aggregate
    through an AQE-broadcast group-key join)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    clamped = ev.join(bounds, "event_type").withColumn(
        "wv", F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    )
    return clamped.groupBy("event_type").agg(
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum((F.col("value") < F.col("lo")).cast("bigint")).alias("n_clamped_low"),
        F.sum((F.col("value") > F.col("hi")).cast("bigint")).alias("n_clamped_high"),
        (F.sum(F.col("value").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1)))
        .alias("raw_mean"),
        F.round(
            F.sum(F.col("wv").cast("decimal(18,6)")).cast("decimal(28,6)").cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


WINSORIZED_VALUE_STATS_SQL = """
WITH bounds AS (
  SELECT event_type,
    round(quantile_cont(value, 0.05), 6) AS lo,
    round(quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY event_type
),
clamped AS (
  SELECT e.event_type, e.value, b.lo, b.hi,
    least(greatest(e.value, b.lo), b.hi) AS wv
  FROM events e JOIN bounds b USING (event_type)
)
SELECT event_type,
  any_value(lo) AS lo, any_value(hi) AS hi,
  CAST(SUM(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_low,
  CAST(SUM(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_high,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS raw_mean,
  round(CAST(CAST(SUM(CAST(wv AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / COUNT(*), 6)
    AS winsorized_mean
FROM clamped
GROUP BY event_type
"""


def ab_test_value_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation analytics: Welch's t statistic per event type
    between md5-deterministic A/B user buckets — means and variances from
    the SAME exact decimal sufficient statistics pass as the trend/corr
    operators (Σx, Σx², n per arm in one grouped aggregate), the t formula
    evaluated per-row in IEEE double and rounded 6 dp. The A/B split is
    the hash_sample discipline: stable under reruns and repartitioning."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    bucket_a = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2 == 0
    )
    yd = F.col("value").cast("decimal(12,2)")
    sums = ev.groupBy("event_type").agg(
        F.sum(F.when(bucket_a, 1).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(bucket_a, yd)).cast("double").alias("sa"),
        F.sum(F.when(bucket_a, yd * yd)).cast("double").alias("qa"),
        F.sum(F.when(~bucket_a, 1).otherwise(0)).cast("double").alias("nb"),
        F.sum(F.when(~bucket_a, yd)).cast("double").alias("sb"),
        F.sum(F.when(~bucket_a, yd * yd)).cast("double").alias("qb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("na")) / (F.col("na") - F.lit(1.0))
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb")) / (F.col("nb") - F.lit(1.0))
    t = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    return sums.select(
        "event_type",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
    )


AB_TEST_VALUE_TTEST_SQL = """
WITH tagged AS (
  SELECT event_type, value,
    CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0 AS in_a
  FROM events
),
sums AS (
  SELECT event_type,
    CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS DOUBLE) AS na,
    CAST(SUM(CASE WHEN in_a THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS sa,
    CAST(SUM(CASE WHEN in_a THEN CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS qa,
    CAST(SUM(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
    CAST(SUM(CASE WHEN NOT in_a THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS sb,
    CAST(SUM(CASE WHEN NOT in_a THEN CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS qb
  FROM tagged GROUP BY event_type
)
SELECT event_type,
  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
  round(sa / na, 6) AS mean_a,
  round(sb / nb, 6) AS mean_b,
  round((sa / na - sb / nb)
        / sqrt(((qa - sa * sa / na) / (na - 1.0)) / na
             + ((qb - sb * sb / nb) / (nb - 1.0)) / nb), 6) AS t_stat
FROM sums
"""


def chisq_event_type_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test (event_type × A/B user bucket) from
    exact contingency counts: observed per cell, expected =
    row_total·col_total/grand_total, χ² = Σ (o−e)²/e summed as 6-dp
    DECIMAL cell terms (order-independent). One grouped aggregate + tiny
    broadcast margins."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2
    ).cast("int")
    cells = ev.select("event_type", bucket.alias("bucket")).groupBy(
        "event_type", "bucket"
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("bucket").agg(F.sum("o").alias("ct"))
    grand = cells.agg(F.sum("o").alias("gt"))
    term = (
        cells.join(rows_, "event_type")
        .join(cols_, "bucket")
        .crossJoin(grand)
        .select(
            F.round(
                (
                    F.col("o").cast("double")
                    - F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("gt").cast("double")
                )
                * (
                    F.col("o").cast("double")
                    - F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("gt").cast("double")
                )
                / (F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("gt").cast("double")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("term"),
        )
    )
    return term.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("term").cast("decimal(28,6)").cast("double").alias("chi_square"),
    )


CHISQ_EVENT_TYPE_BUCKET_SQL = """
WITH cells AS (
  SELECT event_type,
    CAST(CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS INT) AS bucket,
    COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
rows_ AS (SELECT event_type, SUM(o) AS rt FROM cells GROUP BY event_type),
cols_ AS (SELECT bucket, SUM(o) AS ct FROM cells GROUP BY bucket),
grand AS (SELECT SUM(o) AS gt FROM cells),
term AS (
  SELECT CAST(round(
    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))
    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))
    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS term
  FROM cells JOIN rows_ USING (event_type) JOIN cols_ USING (bucket) CROSS JOIN grand
)
SELECT COUNT(*) AS n_cells,
  CAST(CAST(SUM(term) AS DECIMAL(28,6)) AS DOUBLE) AS chi_square
FROM term
"""


def ab_test_ks_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event type between the
    md5-deterministic A/B arms — the DISTRIBUTION-shift companion to the
    Welch t (mean shift): per distinct value, cumulative arm fractions
    over the per-type order window (one shuffle + sort — the minimum for
    an ordered CDF), KS = max |F_a − F_b|, rounded 6 dp at the end. All
    fractions are exact-count IEEE divisions, so the max is deterministic."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    in_a = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 2 == 0
    )
    cells = (
        ev.select("event_type", "value", in_a.alias("in_a"))
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("in_a"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).alias("cb"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    diff = F.abs(
        F.sum("ca").over(wcum).cast("double") / F.sum("ca").over(wall).cast("double")
        - F.sum("cb").over(wcum).cast("double") / F.sum("cb").over(wall).cast("double")
    )
    return (
        cells.select(
            "event_type",
            F.sum("ca").over(wall).alias("n_a"),
            F.sum("cb").over(wall).alias("n_b"),
            diff.alias("d"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.round(F.max("d"), 6).alias("ks_stat"),
        )
    )


AB_TEST_KS_STAT_SQL = """
WITH cells AS (
  SELECT event_type, value,
    SUM(CASE WHEN CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
             THEN 1 ELSE 0 END) AS ca,
    SUM(CASE WHEN CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 = 0
             THEN 0 ELSE 1 END) AS cb
  FROM events GROUP BY event_type, value
),
cum AS (
  SELECT event_type,
    CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS n_a,
    CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS n_b,
    abs(CAST(SUM(ca) OVER w AS DOUBLE) / CAST(SUM(ca) OVER (PARTITION BY event_type) AS DOUBLE)
      - CAST(SUM(cb) OVER w AS DOUBLE) / CAST(SUM(cb) OVER (PARTITION BY event_type) AS DOUBLE)) AS d
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY value ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, MAX(n_a) AS n_a, MAX(n_b) AS n_b, round(MAX(d), 6) AS ks_stat
FROM cum GROUP BY event_type
"""


def quantile_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile SKETCH vs exact quantiles (ext/quantiles.py —
    r10: the third oracle-replayable sketch next to the md5 HLL and the
    CMS monitor): per event_type, a k=256 bottom-k-by-md5(event_id)
    uniform sample estimates p50/p90/p99 of `value` as the sample's own
    order statistics, reported beside the exact interpolated quantiles.
    The sketch state is what a 100 TB pipeline keeps per shard/day: it
    merges by union + re-prune to the IDENTICAL one-shot state
    (mergeability pinned by tests/test_quantiles.py), so any later
    quantile question is answered without re-scanning history. Estimates
    are exact stored doubles (no interpolation, no libm) → bit-for-bit
    SQL-replayable; the exact quantiles use percentile ↔ quantile_cont
    (parity-safe), rounded 6 dp per the repo float rules.

    Plan: two-stage grouped_topk prune (no per-group single-task
    window) + one hash agg for the sample side; one percentile agg for
    the exact side; equi-join on event_type."""
    from scripts_toolkit_spark.ext.quantiles import bottomk_sample, sample_quantiles

    ev = load_table(spark, sf_dir, "events")
    samp = bottomk_sample(ev, ["event_type"], "value", "event_id", 256)
    est = sample_quantiles(
        samp, ["event_type"], "value",
        {"p50_est": 0.5, "p90_est": 0.9, "p99_est": 0.99},
    )
    exact = ev.where(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_exact"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_exact"),
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_rows", "n_sample",
        "p50_est", "p90_est", "p99_est",
        "p50_exact", "p90_exact", "p99_exact",
    )


QUANTILE_SKETCH_VALUES_SQL = """
WITH pr AS (
  SELECT event_type, value, md5(CAST(event_id AS VARCHAR)) AS pr
  FROM events WHERE value IS NOT NULL
),
samp AS (
  SELECT event_type, value
  FROM pr
  QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY pr, value) <= 256
),
est AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_sample,
    list_sort(list(value)) AS vs
  FROM samp GROUP BY event_type
),
ex AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
    ROUND(quantile_cont(value, 0.9), 6) AS p90_exact,
    ROUND(quantile_cont(value, 0.99), 6) AS p99_exact
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_rows, n_sample,
  vs[greatest(1, CAST(ceil(0.5 * n_sample) AS INT))] AS p50_est,
  vs[greatest(1, CAST(ceil(0.9 * n_sample) AS INT))] AS p90_est,
  vs[greatest(1, CAST(ceil(0.99 * n_sample) AS INT))] AS p99_est,
  p50_exact, p90_exact, p99_exact
FROM ex JOIN est USING (event_type)
"""


def incremental_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING quantile monitor
    (streaming/quantile_stream.py): events split into three deterministic
    pseudo-batches (pmod(event_id, 3) — a non-nullable key, so the
    batches PARTITION the rows), each batch's ≤ k·|groups| bottom-k
    sample rows written through the replay-idempotent foreachBatch
    processor, then the merged store answers p50/p90/p99 beside the
    exact quantiles. The bottom-k state is a global-md5-prefix, so the
    merged state is IDENTICAL to the one-shot sketch — which is why the
    ORACLE is the one-shot SQL replay (same output as
    `quantile_sketch_values`): equality here PROVES the incremental
    merge, not just the plan. Store path is applicationId-namespaced
    (the r7 convention — no cross-session races)."""
    from scripts_toolkit_spark.ext.quantiles import sample_quantiles
    from scripts_toolkit_spark.plans.ext_demos import _session_index_path
    from scripts_toolkit_spark.streaming.quantile_stream import (
        make_quantile_processor,
        merged_state,
    )

    ev = load_table(spark, sf_dir, "events")
    path = _session_index_path(spark, sf_dir, "quantile_store")
    proc = make_quantile_processor(path, ["event_type"], "value", "event_id", 256)
    for b in range(3):
        # split on the REQUIRED-non-null event_id (advisor r10): a
        # user_id % 3 split silently dropped NULL-user rows from every
        # pseudo-batch — no such rows in the test data today, but the
        # one-shot-oracle equality contract must hold if that changes
        proc(ev.where(F.pmod(F.col("event_id"), F.lit(3)) == b), b)
    merged = merged_state(spark, path, ["event_type"], "value", 256)
    est = sample_quantiles(
        merged, ["event_type"], "value",
        {"p50_est": 0.5, "p90_est": 0.9, "p99_est": 0.99},
    )
    exact = ev.where(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_exact"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_exact"),
    )
    return exact.join(est, "event_type").select(
        "event_type", "n_rows", "n_sample",
        "p50_est", "p90_est", "p99_est",
        "p50_exact", "p90_exact", "p99_exact",
    )


# merged incremental state == one-shot sketch, so the oracle is the
# one-shot replay — the strongest SQL statement of mergeability
INCREMENTAL_QUANTILE_SKETCH_SQL = QUANTILE_SKETCH_VALUES_SQL


# ------------------------------------------------- EWMA forecasting ----
# r12: the time-series family (fill-forward, resample, OLS trend, Markov,
# retention) gains FORECASTING — exponential smoothing, the production
# baseline smoother. Cross-engine recurrences are the #1 oracle hazard
# (the r11 ADPCM lesson), so the recurrence l_t = (x_t + 3·l_{t-1}) / 4
# (α = 1/4) is evaluated in CLOSED FORM instead: l_13 · 4^13 =
# Σ_t x_t · w_t with exact INTEGER weights w_0 = 3^13,
# w_t = 4^(t-1) · 3^(13-t) — one decimal dot product and ONE double
# division at the end. No per-step rounding exists to diverge.
_EWMA_T = 14  # days 2024-01-01 .. 2024-01-14 (t = 0..13), present at every SF
_EWMA_W = [3 ** 13] + [4 ** (t - 1) * 3 ** (13 - t) for t in range(1, 14)]
_EWMA_DEN_CENTS = (4 ** 13) * 100  # weight denominator × cents scale


def ewma_event_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exponentially-weighted level over a fixed 14-day
    window (α = 1/4, zero-filled missing days), emitted as the next-day
    forecast beside the last observed day and a hash-gated `rising`
    flag. Money-exact: daily sums in DECIMAL(12,2) → integer cents →
    exact decimal dot product with the closed-form integer weights →
    one rounded double division.

    Scale shape: one grouped aggregate over the window scan, a 14-element
    dense positional weight array (O(1) element_at — the measured 10×
    map-lookup penalty avoided), and a 5-type × 14-day grid built by
    generator explode (no cross join). At 100 TB the state is one row
    per (entity, day-bucket) — the standard pre-aggregation every
    monitoring pipeline runs."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        .where(F.col("day").between("2024-01-01", "2024-01-14"))
    )
    t = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
    daily = ev.groupBy("event_type", t.alias("t")).agg(
        (F.sum("v").cast("decimal(20,2)") * 100).cast("decimal(20,0)").alias("cents")
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(F.array(*[F.lit(i) for i in range(_EWMA_T)])).alias("t"),
        )
    )
    wts = F.element_at(
        F.array(*[F.lit(str(w)).cast("decimal(18,0)") for w in _EWMA_W]),
        F.col("t") + 1,
    )
    filled = grid.join(daily, ["event_type", "t"], "left").select(
        "event_type",
        "t",
        F.coalesce(F.col("cents"), F.lit(0).cast("decimal(20,0)")).alias("cents"),
        wts.alias("wt"),
    )
    agg = filled.groupBy("event_type").agg(
        F.sum((F.col("cents") * F.col("wt")).cast("decimal(38,0)")).alias("m"),
        F.sum(F.when(F.col("cents") > 0, 1).otherwise(0)).cast("bigint").alias("n_active_days"),
        F.max(F.when(F.col("t") == _EWMA_T - 1, F.col("cents"))).alias("last_cents"),
    )
    last_v = F.round(F.col("last_cents").cast("double") / F.lit(100.0), 6)
    fc = F.round(F.col("m").cast("double") / F.lit(float(_EWMA_DEN_CENTS)), 6)
    return agg.select(
        "event_type",
        "n_active_days",
        last_v.alias("last_day_value"),
        fc.alias("ewma_forecast"),
        (last_v > fc).alias("rising"),
    )


def _ewma_sql() -> str:
    w_rows = ", ".join(f"({t}, {w})" for t, w in enumerate(_EWMA_W))
    return f"""
WITH w(t, wt) AS (VALUES {w_rows}),
ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(value AS DECIMAL(12,2)) AS v
  FROM events
  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-01' AND DATE '2024-01-14'
),
daily AS (
  SELECT event_type, date_diff('day', DATE '2024-01-01', day) AS t,
         CAST(SUM(v) * 100 AS BIGINT) AS cents
  FROM ev GROUP BY event_type, day
),
grid AS (
  SELECT event_type, t FROM (SELECT DISTINCT event_type FROM ev) CROSS JOIN w
),
filled AS (
  SELECT g.event_type, g.t, COALESCE(d.cents, 0) AS cents, w.wt
  FROM grid g
  LEFT JOIN daily d ON d.event_type = g.event_type AND d.t = g.t
  JOIN w ON w.t = g.t
),
agg AS (
  SELECT event_type,
    SUM(CAST(cents AS HUGEINT) * wt) AS m,
    CAST(SUM(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active_days,
    MAX(CASE WHEN t = {_EWMA_T - 1} THEN cents END) AS last_cents
  FROM filled GROUP BY event_type
)
SELECT event_type, n_active_days,
  round(CAST(last_cents AS DOUBLE) / 100.0, 6) AS last_day_value,
  round(CAST(m AS DOUBLE) / {_EWMA_DEN_CENTS}.0, 6) AS ewma_forecast,
  round(CAST(last_cents AS DOUBLE) / 100.0, 6)
    > round(CAST(m AS DOUBLE) / {_EWMA_DEN_CENTS}.0, 6) AS rising
FROM agg
"""


EWMA_EVENT_FORECAST_SQL = _ewma_sql()
