"""Join operators (SURVEY.md §2.7 J1–J7, §2.6 D3–D5).

The reference implements every join as Python nested loops or dict merges
(e.g. the 4-deep label-resolution loop, cdr_taxonomy_processor.py:170-183).
All are equi-joins with one small side → broadcast hash joins here. Beyond
the reference we add the two non-equi shapes its data model implies but its
code never reached (validity-window lookup over start/end dates — MDRM
README:20-22 — and ordered as-of matching), both built scale-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def broadcast_enrich(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """J1/J4/J5: fact-table enrichment against a small dimension. Explicit
    broadcast hint — never shuffle 100 TB of facts to join a KB dictionary
    (the auto-threshold can silently flip to SMJ when stats are missing)."""
    return facts.join(F.broadcast(dim), on, how)


def label_resolution(
    nodes: DataFrame,
    label_arcs: DataFrame,
    labels: DataFrame,
) -> DataFrame:
    """J1: the reference's O(P·A·L) nested-loop label join
    (cdr_taxonomy_processor.py:170-183) as two chained broadcast hash joins:
    node.id = arc.arc_from, arc.arc_to = label.label_key → (id, label_text).
    """
    return (
        nodes.join(F.broadcast(label_arcs), nodes["id"] == label_arcs["arc_from"])
        .join(F.broadcast(labels), label_arcs["arc_to"] == labels["label_key"])
        .select(nodes["id"], labels["label_text"])
    )


def anti(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    """D3: set-difference as a left-anti join — the scalable form of the
    reference's Python set subtraction (cdr_taxonomy_processor.py:133-138)."""
    return left.join(right, on, "left_anti")


def semi(left: DataFrame, right: DataFrame, on: Column) -> DataFrame:
    return left.join(right, on, "left_semi")


def range_bucket_join(
    facts: DataFrame,
    buckets: DataFrame,
    value: Column,
    lo: Column,
    hi: Column,
) -> DataFrame:
    """J7 (range/theta): non-equi join of facts against a small set of
    [lo, hi) bands. With a broadcast small side Spark plans a
    BroadcastNestedLoopJoin — O(|facts|·|bands|) per partition but zero
    shuffle of the fact side, which is the right trade for band tables of
    tens-to-thousands of rows."""
    return facts.join(F.broadcast(buckets), (value >= lo) & (value < hi), "inner")


def validity_window_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    at: Column,
    start: Column,
    end: Column,
) -> DataFrame:
    """J7 (validity-window): match each fact to the dimension row whose
    [start, end] interval covers the fact's time — the MDRM
    start_date/end_date lookup shape (reference component README:20-22).
    Equi-join on the key (hash/broadcast) + interval predicate pushed into
    the join condition."""
    cond = (facts[key] == dim[key]) & (at >= start) & (at <= end)
    return facts.alias("f").join(F.broadcast(dim).alias("d"), cond, "left")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side's key into
    `salt_buckets` sub-keys and replicate the (small-ish but
    non-broadcastable) dim side across all salts. A hot key's rows spread
    over `salt_buckets` reducers instead of one. AQE's skew-join splitting
    handles sort-merge skew automatically; explicit salting remains the tool
    when the skewed side feeds a subsequent aggregation on the same key.

    Only 'inner' and 'left' are valid: with 'right'/'full', each UNMATCHED
    dim row would surface once per salt replica, silently corrupting the
    result.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: replicated "
            "dim rows would duplicate unmatched right-side output"
        )
    f = facts.withColumn(
        "__salt", (F.hash(F.col(key), F.monotonically_increasing_id()) % salt_buckets + salt_buckets) % salt_buckets
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    d = dim.select("*", salts)
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """J7 (as-of): for each left row, the most recent right row with
    right.ts <= left.ts for the same key (`direction="backward"`, the
    default), or the EARLIEST right row with right.ts >= left.ts
    (`direction="forward"` — next-event attribution). Forward is the same
    sort-based union-scan run in reverse time order; ties still match and
    `tolerance` bounds the look-AHEAD instead of the staleness.

    Implementation is the SORT-BASED union-scan, not a join: tag both
    inputs, union, and fill the right-side values forward over a window
    ordered by (ts, tag). One shuffle on (key), one sort — no row
    explosion, no range-join blowup. This is the plan that survives 100 TB
    (an equi-join + filter + row_number would materialize every candidate
    pair first).

    Ties (right.ts == left.ts) match, mirroring standard ASOF >= semantics:
    the right row sorts before the left row at equal ts via the tag.

    `tolerance` (bounded staleness — the common production variant) is a
    SQL interval literal, e.g. "30 minutes": a match older than
    left.ts − tolerance is discarded (NULLed, like an unmatched left row).
    Same plan — the filled payload carries the matched timestamp, and one
    more comparison gates it; no extra shuffle or join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    tol = F.expr(f"INTERVAL {tolerance}") if tolerance is not None else None
    lcols = left.columns
    rvals = list(right_cols) or [c for c in right.columns if c not in (key, right_ts)]

    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rvals],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    unioned = tagged_r.unionByName(tagged_l)

    w = (
        Window.partitionBy("__k")
        .orderBy(F.desc("__t") if fwd else F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # fill ONE struct payload (non-null exactly on right rows): a right row
    # whose value column is legitimately NULL still matches as a row,
    # instead of being skipped by ignorenulls on the bare column. The
    # payload carries the matched timestamp (__rt) for the tolerance gate.
    payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__t").alias("__rt"),
            *[F.col(f"__r_{c}").alias(c) for c in rvals],
        ),
    )
    matched = F.last(payload, ignorenulls=True).over(w)
    if tol is not None:
        gate = (
            matched.getField("__rt") <= F.col("__t") + tol
            if fwd
            else matched.getField("__rt") >= F.col("__t") - tol
        )
        matched = F.when(gate, matched)
    filled = unioned.select("*", matched.alias("__m"))
    return filled.where(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__m").getField(c).alias(f"{c}_asof") for c in rvals],
    )
