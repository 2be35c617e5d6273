"""Graph operator tests on a fixture DAG shaped like the CDR linkbase
(multi-parent concept, column vs line branches, labels)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.operators import graph as G

# child → parent (reference arc direction, cdr_taxonomy_processor.py:147)
EDGES = [
    # line placement of cc_RCON2170 on schedule RC
    ("cc_RCON2170", "line_12"),
    ("line_12", "sch-RC"),
    ("sch-RC", "root"),
    # column placement of the SAME concept on schedule RCB (multi-path!)
    ("cc_RCON2170", "column_A"),
    ("column_A", "colset_1"),
    ("colset_1", "sch-RCB"),
    ("sch-RCB", "root"),
    # a second concept, line-kind with an extra level
    ("cc_UBPR9999", "line_77"),
    ("line_77", "group_x"),
    ("group_x", "sch-RC"),
]

LABELS = [
    ("sch-RC", "Balance Sheet"),
    ("sch-RCB", "Securities"),
    ("column_A", "Column A"),
    ("colset_1", "Column Set 1"),
    ("line_12", "Line 12"),
]


def _edges(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


def test_roots_and_leaves(spark):
    e = _edges(spark)
    assert [r["node"] for r in G.roots(e).collect()] == ["root"]
    lv = {r["node"] for r in G.leaves(e).collect()}
    assert lv == {"cc_RCON2170", "cc_UBPR9999"}


def test_expand_paths_multiplicity(spark):
    e = _edges(spark)
    lv = G.leaves(e)
    paths = G.expand_paths(e, lv, "root").collect()
    by_concept = {}
    for r in paths:
        by_concept.setdefault(r["concept"], []).append(r["path"])
    # multi-parent concept yields one path per placement
    assert len(by_concept["cc_RCON2170"]) == 2
    assert len(by_concept["cc_UBPR9999"]) == 1
    assert ["cc_UBPR9999", "line_77", "group_x", "sch-RC", "root"] in by_concept["cc_UBPR9999"]


def test_expand_paths_cycle_raises(spark):
    """A cycle can never drain the open-path set: the loop must hit
    max_depth and raise, not spin or silently return partial paths."""
    import pytest

    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "root")], "src string, dst string"
    )
    start = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(RuntimeError, match="converge"):
        G.expand_paths(cyc, start, "root", max_depth=6)


def test_expand_paths_depth_offsets_from_probe_interval(spark):
    """Convergence must be detected whether or not the chain depth lands on
    a probe hop (the loop checkpoints/probes every k hops, not every hop)."""
    for depth in (1, 2, 3, 4, 5):
        chain = [(f"n{i}", f"n{i + 1}") for i in range(depth - 1)] + [
            (f"n{depth - 1}", "root")
        ]
        e = spark.createDataFrame(chain, "src string, dst string")
        start = spark.createDataFrame([("n0",)], "node string")
        got = G.expand_paths(e, start, "root").collect()
        assert len(got) == 1 and len(got[0]["path"]) == depth + 1, f"depth={depth}"


def test_expand_paths_closure_equals_loop(spark):
    """The broadcast-branch closure strategy (round-9: one capped collect
    of the internal edge slice + a memoized driver-side DFS + one start
    join) must return EXACTLY the one-hop shuffle loop's rows —
    multi-parent multiplicity included — on both the multi-path fixture
    and a deep chain."""

    def rows(df):
        return sorted((r["concept"], tuple(r["path"])) for r in df.collect())

    e = _edges(spark)
    lv = G.leaves(e)
    closure = rows(G.expand_paths(e, lv, "root", broadcast_edges=True))
    loop = rows(G.expand_paths(e, lv, "root", broadcast_edges=False))
    assert closure == loop
    assert closure, "degenerate: no paths"

    chain = [(f"n{i}", f"n{i + 1}") for i in range(12)] + [("n12", "root")]
    ec = spark.createDataFrame(chain, "src string, dst string")
    start = spark.createDataFrame([("n0",)], "node string")
    assert rows(G.expand_paths(ec, start, "root", broadcast_edges=True)) == rows(
        G.expand_paths(ec, start, "root", broadcast_edges=False)
    )


def test_expand_paths_closure_cap_falls_back_to_loop(spark, monkeypatch):
    """Round-9 verdict "What's wrong" #1: the closure's internal-edge
    collect must be GUARDED, not premised — with the cap lowered below
    the fixture's internal-edge count, broadcast_edges=True must
    auto-route to the shuffle loop (same discipline as pick_centroids'
    collect cap) and still return the identical rows. Also pins that the
    probe truly capped the collect: the closure helper returns None
    rather than raising or collecting past the cap."""
    from scripts_toolkit_spark.operators import graph as graph_mod

    def rows(df):
        return sorted((r["concept"], tuple(r["path"])) for r in df.collect())

    e = _edges(spark)
    lv = G.leaves(e)
    want = rows(G.expand_paths(e, lv, "root", broadcast_edges=False))

    monkeypatch.setattr(graph_mod, "_CLOSURE_EDGE_CAP", 2)
    assert (
        graph_mod._expand_paths_closure(e, lv, "root", 32) is None
    ), "closure must decline past the cap"
    got = rows(G.expand_paths(e, lv, "root", broadcast_edges=True))
    assert got == want
    assert got, "degenerate: no paths"


def test_expand_paths_closure_deep_chain_raises_convergence(spark):
    """Advisor r9: the closure DFS must prune at the depth budget DURING
    recursion — an internal chain far longer than max_depth reports the
    documented convergence error, never RecursionError (the budget used
    to be checked only on return, so DFS depth tracked the chain
    length)."""
    import pytest

    n = 3000  # far past any plausible recursion headroom for max_depth=6
    chain = [(f"n{i}", f"n{i + 1}") for i in range(n)] + [(f"n{n}", "root")]
    ec = spark.createDataFrame(chain, "src string, dst string")
    start = spark.createDataFrame([("n0",)], "node string")
    with pytest.raises(RuntimeError, match="converge"):
        G.expand_paths(ec, start, "root", max_depth=6)


def test_expand_paths_closure_ignores_dead_end_chains(spark):
    """Advisor r10: the budget raise must fire only for ROOT-REACHING
    suffixes. An acyclic dead-end chain (or dead cycle) deeper than
    max_depth contributes no suffix paths — the closure must prune it
    (reverse BFS from the root) and expand the valid starts normally,
    not report a spurious convergence error."""
    edges = (
        [("s", "a"), ("a", "root")]
        + [(f"d{i}", f"d{i + 1}") for i in range(20)]  # dead chain, no root
        + [("x", "y"), ("y", "x")]  # dead cycle, no exit to root
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    start = spark.createDataFrame([("s",)], "node string")
    got = G._expand_paths_closure(e, start, "root", max_depth=6)
    assert got is not None, "closure must not decline (edges are tiny)"
    rows = sorted((r["concept"], tuple(r["path"])) for r in got.collect())
    assert rows == [("s", ("s", "a", "root"))]


def test_classify_and_assemble(spark):
    e = _edges(spark)
    lv = G.leaves(e)
    classified = G.classify_paths(G.expand_paths(e, lv, "root"))
    rows = {(r["concept"], r["schedule"], r["kind"]): r for r in classified.collect()}

    col = rows[("cc_RCON2170", "RCB", "column")]
    assert col["mid"] == ["sch-RCB", "colset_1", "column_A"]
    line = rows[("cc_RCON2170", "RC", "line")]
    assert line["mid"] == ["sch-RC", "line_12"]

    labels = spark.createDataFrame(LABELS, "node string, label_text string")
    assembled = G.assemble_taxonomy(classified, labels)
    a = {(r["concept"], r["schedule"]): r for r in assembled.collect()}

    rcb = a[("cc_RCON2170", "RCB")]
    assert rcb["column_ids"]["schedule"]["code"] == "sch-RCB"
    assert rcb["column_ids"]["schedule"]["label"] == "Securities"
    assert rcb["column_ids"]["colset"]["code"] == "colset_1"
    assert rcb["column_ids"]["column"]["label"] == "Column A"
    assert rcb["line_ids"] is None

    rc = a[("cc_RCON2170", "RC")]
    assert rc["line_ids"]["schedule"]["label"] == "Balance Sheet"
    assert rc["line_ids"]["extras"]["extra_col_0"]["code"] == "line_12"
    assert rc["column_ids"] is None

    # extra level on the deep line path
    deep = a[("cc_UBPR9999", "RC")]
    assert deep["line_ids"]["extras"]["extra_col_0"]["code"] == "group_x"
    assert deep["line_ids"]["extras"]["extra_col_1"]["code"] == "line_77"

    # JSON export carries the nesting
    js = {r["concept"]: r["json"] for r in G.taxonomy_json(assembled).collect()}
    assert "Balance Sheet" in js["cc_RCON2170"] and "Securities" in js["cc_RCON2170"]


def test_connected_components_shapes(spark):
    """Chains, triangles, and disjoint pairs must all resolve to the
    min-id component label; convergence takes diameter-many iterations."""
    from scripts_toolkit_spark.operators.graph import connected_components

    pairs = [
        (5, 3), (3, 9), (9, 7),        # chain: component 3
        (20, 21), (21, 22), (22, 20),  # triangle: component 20
        (40, 41),                      # pair: component 40
    ]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        5: 3, 3: 3, 9: 3, 7: 3,
        20: 20, 21: 20, 22: 20,
        40: 40, 41: 40,
    }


def test_connected_components_long_chain(spark):
    """Pointer halving must close a 300-node chain within the iteration cap
    (plain propagation would need 299 rounds)."""
    from scripts_toolkit_spark.operators.graph import connected_components

    pairs = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {0} and len(got) == 301


def test_pagerank_fixed_point_invariants(spark):
    """Fixed-point PageRank sanity on a symmetric star graph: the hub
    outranks the (identical) spokes; total mass stays within floor-loss
    of `scale`; every node is at least the teleport base."""
    from scripts_toolkit_spark.operators.graph import pagerank_fixed_point

    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "h"), ("b", "h"), ("c", "h")]
    df = spark.createDataFrame(edges, "src string, dst string")
    pr = {r["node"]: r["r"] for r in pagerank_fixed_point(df, iters=8).collect()}
    assert pr["h"] > pr["a"] == pr["b"] == pr["c"]
    scale = 10**12
    base = (15 * (scale // 4)) // 100
    assert all(v >= base for v in pr.values())
    assert 0.9 * scale <= sum(pr.values()) <= scale
