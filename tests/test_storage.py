"""Storage-layout tests: quarter-partitioned EAV store prunes partitions;
bucketed tables join without a shuffle; salted join preserves results."""

from __future__ import annotations

from pyspark.sql import functions as F

from scripts_toolkit_spark.io.catalog import load_table
from scripts_toolkit_spark.operators.joins import salted_join
from scripts_toolkit_spark.operators.reshape import melt_to_eav, write_eav


def test_eav_store_partition_pruning(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders").limit(200)
    wide = o.select(
        F.col("o_orderkey").alias("rssd"),
        F.col("o_totalprice").alias("totalprice"),
    )
    parts = []
    for q in (20240331, 20240630, 20240930):
        parts.append(melt_to_eav(wide, {"totalprice": "float"}, q))
    eav = parts[0].unionByName(parts[1]).unionByName(parts[2])
    path = str(tmp_path / "eav_store")
    write_eav(eav, path)

    back = spark.read.parquet(path).where(F.col("quarter") == 20240630)
    assert back.count() == 200
    # partition pruning: only the selected quarter's directory is scanned
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "quarter=20240630" in plan or "PartitionFilters: [isnotnull(quarter" in plan
    files = back.select(F.input_file_name()).distinct().collect()
    assert all("quarter=20240630" in r[0] for r in files)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketed tables on the join key: Spark reads bucket metadata and
    plans a sort-merge join WITHOUT an Exchange on either side — the
    co-located-join pattern for repeated fact⋈fact joins at scale."""
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    spark.sql(f"USE buckdemo")
    warehouse_cleanup = ("orders_b", "lineitem_b")
    for t in warehouse_cleanup:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "lineitem_b"
    )
    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # no shuffle exchange anywhere in the bucketed join plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == li.count()
    for t in warehouse_cleanup:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.sql("USE default")


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = (
        li.join(p, "l_partkey")
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, p, "l_partkey", salt_buckets=8)
        .groupBy("p_brand")
        .agg(F.sum("l_quantity").alias("q"), F.count(F.lit(1)).alias("n"))
    )
    a = {r["p_brand"]: (r["q"], r["n"]) for r in plain.collect()}
    b = {r["p_brand"]: (r["q"], r["n"]) for r in salted.collect()}
    assert a == b


def test_eav_store_schema_evolution(spark, tmp_path):
    """The EAV layout's core promise: a NEW attribute appearing next
    quarter needs no schema migration — it lands as new rows, the store
    schema never changes, and per-quarter reads see exactly their columns
    after pivoting."""
    q1_wide = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "rssd long, totalprice double"
    )
    q2_wide = spark.createDataFrame(
        [(1, 11.0, 5.0), (2, 21.0, 6.0)], "rssd long, totalprice double, newmetric double"
    )
    path = str(tmp_path / "evolving_store")
    melt_to_eav(q1_wide, {"totalprice": "float"}, 20240331).write.mode("append").partitionBy(
        "quarter"
    ).parquet(path)
    melt_to_eav(
        q2_wide, {"totalprice": "float", "newmetric": "float"}, 20240630
    ).write.mode("append").partitionBy("quarter").parquet(path)

    store = spark.read.parquet(path)
    # schema identical across quarters despite the new attribute
    assert {r["mdrm"] for r in store.where(F.col("quarter") == 20240331).collect()} == {
        "totalprice"
    }
    assert {r["mdrm"] for r in store.where(F.col("quarter") == 20240630).collect()} == {
        "totalprice",
        "newmetric",
    }
    from scripts_toolkit_spark.operators.reshape import pivot_from_eav

    q2_back = pivot_from_eav(
        store.where(F.col("quarter") == 20240630), ["totalprice", "newmetric"]
    )
    got = {r["rssd"]: (r["totalprice"], r["newmetric"]) for r in q2_back.collect()}
    assert got == {1: (11.0, 5.0), 2: (21.0, 6.0)}


def test_zorder_layout_skips_files_on_second_column(spark, sf_dir, tmp_path):
    """Z-order tiling (operators/layout.py): range-partitioning by
    user_id alone makes every file span the FULL value domain (a value
    predicate reads all files); morton tiling bounds each file's value
    footprint to ~a tile, so a 10%-of-domain value band overlaps at most
    half as many files — the parquet min/max skipping the layout buys."""
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.operators.layout import (
        morton_key,
        scale_to_bits,
        zorder_write,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    mm = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    ulo, uhi, vlo, vhi = mm
    x = scale_to_bits(F.col("user_id"), F.lit(ulo), F.lit(uhi), 8)
    y = scale_to_bits(F.col("value"), F.lit(vlo), F.lit(vhi), 8)
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "stripes")
    zorder_write(ev, zpath, x, y, n_files=16, bits=8)
    ev.withColumn("__r", x).repartitionByRange(16, "__r").drop("__r").write.mode(
        "overwrite"
    ).parquet(spath)

    band_lo = vlo + 0.45 * (vhi - vlo)
    band_hi = vlo + 0.55 * (vhi - vlo)

    def overlapping_files(path: str) -> int:
        rows = (
            spark.read.parquet(path)
            .withColumn("f", F.input_file_name())
            .groupBy("f")
            .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
            .collect()
        )
        assert len(rows) >= 8, "layout produced too few files for the test"
        return sum(1 for r in rows if r["lo"] <= band_hi and r["hi"] >= band_lo)

    n_stripe = overlapping_files(spath)
    n_z = overlapping_files(zpath)
    # stripe layout: every file spans the full value domain
    assert n_z <= n_stripe // 2, (n_z, n_stripe)

    # morton key sanity: interleave is order-compatible with the tiling
    r = spark.range(1).select(
        morton_key(F.lit(0b101), F.lit(0b011), 3).alias("k")
    ).first()
    # a bits 1,0,1 -> key bits 0,2,4 ; b bits 1,1,0 -> key bits 1,3
    assert r["k"] == (1 << 0) + (0 << 2) + (1 << 4) + (1 << 1) + (1 << 3)


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC as an alternate columnar store (S-format breadth beyond
    parquet/CSV/XPORT/zip): values round-trip exactly, predicate and
    column pruning reach the ORC scan just as they do for parquet."""
    li = load_table(spark, sf_dir, "lineitem").limit(5000)
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)

    back = spark.read.orc(path)
    assert back.count() == li.count()
    a = sorted((r["l_orderkey"], r["l_linenumber"]) for r in li.collect())
    b = sorted((r["l_orderkey"], r["l_linenumber"]) for r in back.collect())
    assert a == b

    q = back.where(F.col("l_quantity") > 25.0).select("l_orderkey", "l_quantity")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:120]
    schemas = [seg[:150] for seg in plan.split("ReadSchema: ")[1:]]
    assert any("l_orderkey" in s and "l_extendedprice" not in s for s in schemas)


def test_csv_and_json_sink_roundtrip(spark, sf_dir, tmp_path):
    """CSV and JSON-lines sinks round-trip a typed frame (header +
    explicit schema read back) — the interchange surfaces beside the
    parquet/ORC stores."""
    n = load_table(spark, sf_dir, "nation")
    for fmt, opts in (("csv", {"header": "true"}), ("json", {})):
        path = str(tmp_path / f"nation_{fmt}")
        n.write.mode("overwrite").options(**opts).format(fmt).save(path)
        back = (
            spark.read.options(**opts)
            .schema("n_nationkey int, n_name string, n_regionkey int")
            .format(fmt)
            .load(path)
        )
        assert sorted((r["n_nationkey"], r["n_name"]) for r in back.collect()) == sorted(
            (r["n_nationkey"], r["n_name"]) for r in n.collect()
        ), fmt


def test_zordered_parquet_rowgroups_are_skippable(spark, sf_dir, tmp_path):
    """write_zordered_parquet must produce parquet whose ROW-GROUP min/max
    footer stats are tight on BOTH clustering columns — the property a
    min/max-pruning reader skips on — and strictly tighter than a plain
    write of the same frame on both dimensions. Round-trip row equality
    pins that layout never changes data."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.io.sinks import write_zordered_parquet

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, npath = str(tmp_path / "zord"), str(tmp_path / "nat")
    write_zordered_parquet(ev, zpath, ("user_id", "value"), n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(npath)

    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    span_u, span_v = max(1, hi_u - lo_u), (hi_v - lo_v) or 1.0

    def avg_spans(path):
        su, sv, n = 0.0, 0.0, 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                cols = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
                u, v = cols["user_id"].statistics, cols["value"].statistics
                su += (u.max - u.min) / span_u
                sv += (v.max - v.min) / span_v
                n += 1
        assert n > 1, f"degenerate: {n} row groups under {path}"
        return su / n, sv / n

    zu, zv = avg_spans(zpath)
    nu, nv = avg_spans(npath)
    assert zu < nu and zv < nv, f"z-order not tighter: z=({zu:.3f},{zv:.3f}) nat=({nu:.3f},{nv:.3f})"
    # the layout must not alter the data
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    a = ev.agg(F.sum(F.crc32(F.concat_ws("|", "event_id", "user_id")))).collect()[0][0]
    b = back.agg(F.sum(F.crc32(F.concat_ws("|", "event_id", "user_id")))).collect()[0][0]
    assert a == b


def test_orc_roundtrip_preserves_rows_and_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip (Spark-native second columnar format): partitioned
    write → read-back equality, and predicate pushdown reaches the ORC
    scan just as it does for parquet."""
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.io.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "ev_orc")
    ev.write.mode("overwrite").partitionBy("event_type").orc(path)
    back = spark.read.orc(path)
    assert back.count() == ev.count()
    a = ev.agg(F.sum(F.crc32(F.concat_ws("|", "event_id", "user_id")))).collect()[0][0]
    b = back.agg(F.sum(F.crc32(F.concat_ws("|", "event_id", "user_id")))).collect()[0][0]
    assert a == b
    plan = (
        back.where((F.col("event_type") == "view") & (F.col("value") > 50.0))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(value), GreaterThan(value,50.0)" in plan
    # partition pruning: the event_type predicate prunes directories
    assert "PartitionFilters: [isnotnull(event_type" in plan


def test_zordered_rowgroups_prune_for_point_queries(spark, sf_dir, tmp_path):
    """Quantified skipping: for a point predicate on EITHER clustering
    column, the fraction of row groups whose footer min/max EXCLUDES the
    probe (what a pushdown reader skips) must be high under the z-order
    layout and beat the plain layout on both dimensions."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.io.sinks import write_zordered_parquet

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, npath = str(tmp_path / "zord"), str(tmp_path / "nat")
    write_zordered_parquet(ev, zpath, ("user_id", "value"), n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(npath)

    mid = ev.agg(F.expr("percentile(user_id, 0.5)")).collect()[0][0]
    vmid = ev.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]

    def skip_frac(path, col, probe):
        skipped, n = 0, 0
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                cols = {rg.column(i).path_in_schema: rg.column(i) for i in range(rg.num_columns)}
                st = cols[col].statistics
                n += 1
                if probe < st.min or probe > st.max:
                    skipped += 1
        assert n > 1
        return skipped / n

    # contract: strictly better than the plain layout on BOTH dimensions,
    # and a strong absolute floor on at least one (per-dim absolutes
    # depend on the column's value distribution — events.value is skewed,
    # so its linear 8-bit grid concentrates mass in few buckets)
    fracs = {}
    for col, probe in (("user_id", mid), ("value", vmid)):
        z, nat = skip_frac(zpath, col, probe), skip_frac(npath, col, probe)
        assert z > nat, f"{col}: zorder skip {z:.2f} <= natural {nat:.2f}"
        fracs[col] = z
    assert max(fracs.values()) >= 0.5, f"no dimension skips half its row groups: {fracs}"
