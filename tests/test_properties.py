"""Property-based + seeded-random brute-force comparisons.

Hypothesis drives the pure-Python codecs (hundreds of examples, no Spark
startup cost); the distributed operators are checked against independent
brute-force references on seeded random data — the same adversarial
strategy the oracle gate uses, but against a second implementation
rather than a second engine.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scripts_toolkit_spark.io.pdftext import _unescape
from scripts_toolkit_spark.io.xport import ibm_to_ieee, ieee_to_ibm

# IBM hex-float range: 16^-65 ≈ 5.4e-79 … <16^63 ≈ 7.2e75
_IBM_MIN, _IBM_MAX = 1e-70, 1e70


@settings(max_examples=300)
@given(
    st.floats(
        min_value=-_IBM_MAX, max_value=_IBM_MAX, allow_nan=False, allow_infinity=False
    ).filter(lambda x: x == 0.0 or _IBM_MIN < abs(x) < _IBM_MAX)
)
def test_ibm_double_roundtrip_property(x):
    assert ibm_to_ieee(ieee_to_ibm(x)) == x


@settings(max_examples=200)
@given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=255), max_size=40))
def test_pdf_string_escape_roundtrip_property(s):
    from scripts_toolkit_spark.io.pdftext import _escape

    assert _unescape(_escape(s)) == s


def test_asof_join_matches_pandas_merge_asof(spark):
    """asof_join (sort-based union-scan) vs pandas.merge_asof on random
    event streams, with and without tolerance."""
    rng = random.Random(42)
    left = [
        (k, rng.randint(0, 10_000), i)
        for i, k in enumerate(rng.choices(range(30), k=400))
    ]
    right = [
        (k, rng.randint(0, 10_000), 1000 + i)
        for i, k in enumerate(rng.choices(range(30), k=400))
    ]
    ldf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in left], "key int, ts double, lval int"
    )
    rdf = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in right], "key int, ts double, rval int"
    )
    from scripts_toolkit_spark.operators.joins import asof_join

    lp = pd.DataFrame(left, columns=["key", "ts", "lval"]).astype({"ts": "float"})
    rp = pd.DataFrame(right, columns=["key", "ts", "rval"]).astype({"ts": "float"})
    # pandas keeps the LAST right row at equal (key, ts); Spark's window
    # fill does too (sort is stable over the right rows)
    lp = lp.sort_values(["ts", "lval"], kind="stable")
    rp = rp.sort_values(["ts", "rval"], kind="stable")

    for tol_spark, tol_pandas in ((None, None), ("2 SECONDS", 2.0)):
        if tol_spark is None:
            got = asof_join(ldf, rdf, key="key", right_cols=("rval",))
        else:
            # double ts: express tolerance through a timestamp image
            got = asof_join(
                ldf.withColumn("ts", ldf.ts.cast("timestamp")),
                rdf.withColumn("ts", rdf.ts.cast("timestamp")),
                key="key",
                right_cols=("rval",),
                tolerance=tol_spark,
            )
        exp = pd.merge_asof(
            lp,
            rp,
            on="ts",
            by="key",
            direction="backward",
            tolerance=tol_pandas,
        )
        got_map = {r["lval"]: r["rval_asof"] for r in got.collect()}
        exp_map = {
            int(row.lval): (None if pd.isna(row.rval) else int(row.rval))
            for row in exp.itertuples()
        }
        assert got_map == exp_map, f"tolerance={tol_spark}"


def test_simhash_pigeonhole_equals_all_pairs(spark):
    """Pigeonhole equi-join pairing must EXACTLY reproduce the all-pairs
    theta join for every max_hamming (recall 1.0 by construction)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = [(i, " ".join(rng.choices(vocab, k=12))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from scripts_toolkit_spark.ext.dedup import simhash16, simhash_pairs, word_shingles

    fps = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", simhash16(word_shingles("text")).alias("fp")).collect()
    }
    # 16 exercises the degenerate clamp (ball covers the whole space →
    # constant sub-key must yield ALL pairs, not just identical fingerprints)
    for max_hamming in (0, 1, 2, 3, 5, 16):
        expected = {
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a in fps
            for b in fps
            if a < b and bin(fps[a] ^ fps[b]).count("1") <= max_hamming
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in simhash_pairs(df, max_hamming=max_hamming).collect()
        }
        assert got == expected, f"max_hamming={max_hamming}"


def test_melt_pivot_roundtrip_random(spark):
    """wide → EAV → wide must round-trip the float columns exactly on
    random matrices (nulls are SKIPPED in the store and come back null)."""
    rng = random.Random(3)
    cols = ["m1", "m2", "m3"]
    rows = []
    for rssd in range(40):
        vals = [
            None if rng.random() < 0.25 else round(rng.uniform(-1e6, 1e6), 2)
            for _ in cols
        ]
        rows.append((rssd, *vals))
    wide = spark.createDataFrame(rows, "rssd long, m1 double, m2 double, m3 double")

    from scripts_toolkit_spark.operators.reshape import melt_to_eav, pivot_from_eav

    eav = melt_to_eav(wide, {c: "float" for c in cols}, quarter=20240331)
    back = pivot_from_eav(eav, cols)
    got = {r["rssd"]: (r["m1"], r["m2"], r["m3"]) for r in back.collect()}
    for rssd, *vals in rows:
        if all(v is None for v in vals):
            assert rssd not in got  # fully-null rows never reach the store
        else:
            assert got[rssd] == tuple(vals)


def _bpe_ref_apply(word: str, merges) -> list:
    """Reference greedy merge: explicit left-to-right list scan, one rule
    at a time — the semantics the pipe-string rewriting must equal."""
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_pipe_apply(word: str, merges) -> list:
    """The double-pipe string-rewriting mechanics shared by all three
    engine paths (ext/bpe.py module docstring)."""
    seq = "||" + "||".join(word) + "||"
    for left, right in merges:
        seq = seq.replace(f"|{left}||{right}|", f"|{left}{right}|")
    return [t for t in seq.split("|") if t]


@settings(max_examples=400)
@given(
    st.text(alphabet="ab", min_size=0, max_size=24),
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
        ),
        max_size=6,
    ),
)
def test_bpe_pipe_rewriting_equals_reference_scan(word, merges):
    """The pipe-delimited replace chain must equal an explicit
    left-to-right merge scan for EVERY rule sequence — including
    consecutive occurrences ('abab'), self-pairs ('aaa' + (a,a)), and
    rules over previously merged symbols — and stay lossless."""
    got = _bpe_pipe_apply(word, merges)
    assert got == _bpe_ref_apply(word, merges)
    assert "".join(got) == word


# ------------------------- r5 temporal / top-k operators vs brute force ----
def test_scd2_intervals_matches_python_reference(spark):
    rng = random.Random(11)
    rows = []
    for k in range(8):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += rng.randint(1, 3)
            rows.append((k, t, rng.choice("ABC")))
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.operators.spans import scd2_intervals

    df = spark.createDataFrame(rows, "k bigint, t bigint, v string")
    got = {
        (r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["n_rows"])
        for r in scd2_intervals(df, "k", F.col("v"), ["t"], "t").collect()
    }
    # pure-Python run-length reference
    expected = {}
    by_key = {}
    for k, t, v in sorted(rows):
        by_key.setdefault(k, []).append((t, v))
    for k, seq in by_key.items():
        ver, cur = 0, None
        for t, v in seq:
            if v != cur:
                ver += 1
                cur = v
                expected[(k, ver)] = [v, t, t, 1]
            else:
                expected[(k, ver)][2] = t
                expected[(k, ver)][3] += 1
    assert got == {kk: tuple(vv) for kk, vv in expected.items()}


def test_apply_changelog_matches_python_replay(spark):
    rng = random.Random(13)
    rows = []
    for k in range(10):
        for t in range(rng.randint(1, 25)):
            rows.append((k, t, rng.choice("IUD"), float(rng.randint(0, 99))))
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.operators.spans import apply_changelog

    df = spark.createDataFrame(rows, "k bigint, t bigint, o string, v double")
    got = {
        r["k"]: (r["last_op"], r["v"], r["n_ops"])
        for r in apply_changelog(df, "k", F.col("o"), ["t"]).collect()
    }
    state, nops = {}, {}
    for k, t, o, v in sorted(rows):
        nops[k] = nops.get(k, 0) + 1
        state[k] = (o, v)
    expected = {
        k: (o, v, nops[k]) for k, (o, v) in state.items() if o != "D"
    }
    assert got == expected


def test_global_topk_matches_sorted_reference(spark):
    rng = random.Random(17)
    rows = [(i, rng.randint(0, 500)) for i in range(3000)]
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.operators.topk import global_topk

    df = spark.createDataFrame(rows, "id bigint, v bigint").repartition(13)
    got = [
        (r["id"], r["v"])
        for r in global_topk(df, [F.desc("v"), F.asc("id")], k=37).orderBy("rank").collect()
    ]
    expected = sorted(rows, key=lambda r: (-r[1], r[0]))[:37]
    assert got == expected


def test_grouped_topk_matches_per_group_reference(spark):
    """grouped_topk == the naive per-group sort for ANY partitioning of the
    input (the two-stage identity `operators/topk.py` promises), including
    repartition-invariance across two different distributions."""
    rng = random.Random(29)
    rows = [(i, f"g{rng.randint(0, 4)}", rng.randint(0, 200)) for i in range(2500)]
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.operators.topk import grouped_topk

    expected = set()
    by_g: dict[str, list] = {}
    for i, g, v in rows:
        by_g.setdefault(g, []).append((i, g, v))
    for g, rs in by_g.items():
        for rank, (i, _g, v) in enumerate(
            sorted(rs, key=lambda r: (-r[2], r[0]))[:11], start=1
        ):
            expected.add((g, i, v, rank))

    for nparts in (3, 17):
        df = spark.createDataFrame(rows, "id bigint, g string, v bigint").repartition(nparts)
        got = {
            (r["g"], r["id"], r["v"], r["rank"])
            for r in grouped_topk(df, ["g"], [F.desc("v"), F.asc("id")], k=11).collect()
        }
        assert got == expected, f"nparts={nparts}"


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=300, deadline=None)
def test_morton_interleave_is_bijective_and_monotone(a1, b1, a2, b2):
    """Pure-Python twin of the z-order key used by `zorder_layout_stats`
    and `io/sinks.write_zordered_parquet`: the 16-bit Morton interleave is
    a bijection of the 8-bit grid (no two distinct points share a key),
    and fixing one coordinate makes the key strictly monotone in the
    other — the property row-group min/max pruning relies on."""

    def z(a, b):
        k = 0
        for i in range(8):
            k |= ((a >> i) & 1) << (2 * i)
            k |= ((b >> i) & 1) << (2 * i + 1)
        return k

    if (a1, b1) != (a2, b2):
        assert z(a1, b1) != z(a2, b2)
    if a1 < a2:
        assert z(a1, b1) < z(a2, b1)
    if b1 < b2:
        assert z(a1, b1) < z(a1, b2)
