"""One-off probe: enumerate registered queries whose analyzed plan has a
partition-less Window whose lineage reaches an SF-linear scan without an
intervening boundedness boundary (group-less Aggregate, spark_partition_id
partial-top-k stage, Limit, or LogicalRDD checkpoint)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from scripts_toolkit_spark.session import get_spark

_SF_LINEAR_SIGNATURES = {
    "customer": {"c_custkey", "c_name"},
    "supplier": {"s_suppkey", "s_name"},
    "part": {"p_partkey", "p_brand"},
    "orders": {"o_orderkey", "o_custkey"},
    "lineitem": {"l_orderkey", "l_partkey"},
    "events": {"event_type", "user_id"},
    "documents": {"doc_id", "text"},
    "embeddings": {"vec_id", "embedding"},
}


def table_of(node):
    names = {node.output().apply(i).name() for i in range(node.output().size())}
    for t, sig in _SF_LINEAR_SIGNATURES.items():
        if sig <= names:
            return t
    return None


def is_partial_topk_boundary(node) -> bool:
    """True when this Window partitions by spark_partition_id() — the
    partial stage of operators/topk: output is bounded to k rows per input
    partition, so anything above it is KB-scale. Catalyst extracts the
    expression into a `_wN` alias in the Project child; resolve it."""
    ps = node.partitionSpec()
    spec = [ps.apply(i).toString() for i in range(ps.size())]
    if any("SPARK_PARTITION_ID" in s.upper() for s in spec):
        return True
    attrs = {s.split("#")[0] for s in spec if s.startswith("_w")}
    if not attrs:
        return False
    ch = node.children().apply(0)
    if ch.getClass().getSimpleName() != "Project":
        return False
    pl = ch.projectList()
    for i in range(pl.size()):
        s = pl.apply(i).toString()
        if "SPARK_PARTITION_ID" in s.upper() and any(
            f"AS {a}#" in s for a in attrs
        ):
            return True
    return False


def reaches_sf_linear(node):
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate" and node.groupingExpressions().isEmpty():
        return None
    if cls in ("GlobalLimit", "LocalLimit"):
        return None
    if cls == "Window":
        if is_partial_topk_boundary(node):
            return None  # partial-top-k boundary: rows bounded to k per partition
    if "Relation" in cls:
        return table_of(node)
    cs = node.children()
    for i in range(cs.size()):
        t = reaches_sf_linear(cs.apply(i))
        if t:
            return t
    return None


def partitionless_windows(df):
    out = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        ps = node.partitionSpec() if cls == "Window" else None
        all_literal = ps is not None and not ps.isEmpty() and all(
            ps.apply(i).getClass().getSimpleName() == "Literal"
            for i in range(ps.size())
        )
        if cls == "Window" and (ps.isEmpty() or all_literal):
            t = reaches_sf_linear(node)
            if t:
                out.append(t)
        cs = node.children()
        for i in range(cs.size()):
            walk(cs.apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


if __name__ == "__main__":
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    bad = {}
    for name, fn in entrymod.queries().items():
        try:
            vio = partitionless_windows(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            vio = [f"ERR {e}"]
        if vio:
            bad[name] = sorted(set(str(v) for v in vio))
            print(name, bad[name], flush=True)
    print("TOTAL offenders:", len(bad))
