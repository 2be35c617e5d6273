"""Record linkage: blocked fuzzy (edit-distance) joins.

The reference resolves entities only by exact key equality (prefix-key and
dictionary joins, CONV:23-334); a data-cleaning engine also needs the fuzzy
form — match names that differ by a typo — WITHOUT the N² cross join.

Scale shape: the classic blocking pattern —
1) equi-join on a cheap deterministic blocking key (here caller-supplied,
   e.g. a token of the name) so candidates come from an AQE-managed
   shuffle/broadcast equi-join, never a cartesian product;
2) prune by the length band |len(a) − len(b)| ≤ max_dist (a lower bound on
   Levenshtein, so no true match is lost) BEFORE the expensive verify;
3) verify with the native JVM `levenshtein` expression.
Candidate volume is Σ_block |L_b|·|R_b|; pick blocking keys with bounded
block sizes (salt a hot block like an empty-name bucket the same way a
skewed join key is salted).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_join(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    block_keys: list[tuple[Column, Column]],
    max_dist: int = 2,
) -> DataFrame:
    """All (left, right) rows whose block keys ALL match, whose name
    lengths are within `max_dist`, and whose Levenshtein distance is
    ≤ `max_dist`; adds a `lev_dist` int column. Equality of every other
    pairing decision is left to the caller (e.g. drop self/symmetric
    pairs)."""
    cond = None
    for lk, rk in block_keys:
        c = lk.eqNullSafe(rk)
        cond = c if cond is None else (cond & c)
    band = (
        F.abs(F.length(F.col(left_name)) - F.length(F.col(right_name))) <= max_dist
    )
    verified = (
        left.join(right, cond)
        .where(band)
        .withColumn("lev_dist", F.levenshtein(F.col(left_name), F.col(right_name)))
        .where(F.col("lev_dist") <= max_dist)
    )
    return verified
