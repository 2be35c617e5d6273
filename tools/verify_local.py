"""Local replica of the driver's t2 correctness gate.

Runs every `queries()[name]` on Spark at sf0.01 and the matching
`oracle_sql()[name]` on DuckDB over the same parquet, then compares:
  - row count
  - column-name set
  - order-insensitive value comparison (rows sorted after sorting columns
    by name), exact on non-floats, exact-bits on floats (the driver hashes,
    so we must be bit-identical — engine queries use DECIMAL internally to
    guarantee this).

Usage: python tools/verify_local.py [name ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(v):
    """Canonicalize a cell for comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # signed-zero canon: the exact path compares with == (-0.0 == 0.0)
        # but the multiset-hash path keys on repr (repr(-0.0) != repr(0.0));
        # +0.0 collapses -0.0 so both paths agree
        return v + 0.0
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


# Above this row count, skip the exact sorted-multiset comparison (its
# Python sort key is O(n log n) with per-cell string tuples — ~25 min and
# tens of GB on the 9M-row sf0.1 wide melt) and compare an order-insensitive
# COMMUTATIVE hash instead: sum of per-row md5 over the canonical repr.
# Python's float repr is shortest-round-trip, so bit-different doubles hash
# differently — the exact-bits discipline is preserved; only the ability to
# print first-diff rows is lost.
_EXACT_COMPARE_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_VERIFY_EXACT_MAX", "200000"))


def _multiset_hash(cols, rows) -> int:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    acc = 0
    for r in rows:
        t = tuple(_canon(r[i]) for i in idx)
        acc = (acc + int.from_bytes(hashlib.md5(repr(t).encode()).digest(), "big")) % (
            1 << 128
        )
    return acc


def _hash_diff_samples(scols, srows, dcols, drows, limit: int = 3):
    """On multiset-hash mismatch, recover a few differing rows for the
    error message (the fast path drops them; debugging needs examples)."""
    from collections import Counter

    def _counter(cols, rows):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        c: Counter = Counter()
        rep = {}
        for r in rows:
            t = tuple(_canon(r[i]) for i in idx)
            d = hashlib.md5(repr(t).encode()).digest()
            c[d] += 1
            rep.setdefault(d, t)
        return c, rep

    sc, srep = _counter(scols, srows)
    dc, drep = _counter(dcols, drows)
    only_s = [srep[d] for d in (sc - dc) if d in srep][:limit]
    only_d = [drep[d] for d in (dc - sc) if d in drep][:limit]
    return only_s, only_d


def main(names: list[str]) -> int:
    from scripts_toolkit_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("verify-local")
    qs, oracles = e.queries(), e.oracle_sql()
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            print(f"ERROR: unknown query name(s): {', '.join(unknown)}")
            print(f"valid names: {', '.join(sorted(qs))}")
            return 2
        qs = {k: v for k, v in qs.items() if k in names}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed, passed, weak = [], [], []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failed.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            weak.append(name)
            print(f"weak {name}: rows={len(srows)} (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            failed.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            if len(srows) > _EXACT_COMPARE_MAX_ROWS:
                if _multiset_hash(scols, srows) != _multiset_hash(dcols, drows):
                    only_s, only_d = _hash_diff_samples(scols, srows, dcols, drows)
                    problems.append(
                        "values differ (multiset-hash compare, large result); "
                        f"spark-only sample: {only_s}; duckdb-only sample: {only_d}"
                    )
            else:
                sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
                if sset != dset:
                    diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
                    problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            failed.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            passed.append(name)
            print(f"ok   {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")

    print(f"\n{len(passed)} ok, {len(weak)} weak (rows-only), {len(failed)} FAILED of {len(qs)}")
    for n, msg in failed:
        print(f"  FAILED {n}: {msg}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
