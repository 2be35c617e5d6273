"""Empirical scaling probe behind SCALING.md's "Measured scaling" note.

Runs the flagship near-dup pipelines (minhash, simhash64) and the ANN
family (exact-within-cells IVF, compressed-domain IVF-PQ) on 1×/4×/10×
synthetic multiples of the sf0.1 corpus — each base row gains mult−1
perturbed variants (appended token for text, rotated elements for
vectors) so the workload grows in both input AND true-duplicate output —
and prints best-of-2 wall times. No knobs are re-tuned between multiples;
the corpus-size-aware pieces (simhash block layout, √N cell counts) adapt
on their own, which is part of what the probe demonstrates.

Usage: python tools/scale_probe.py [docs|ann|all]   (default: all)
"""

from __future__ import annotations

import sys
import time
from functools import reduce

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
MULTS = (1, 4, 10)


def _spark():
    s = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    return s


def _best2(fn) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(2):
        t0 = time.time()
        rows = fn().count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, rows


def probe_docs(spark) -> None:
    from scripts_toolkit_spark.ext.dedup import minhash_lsh_pairs, simhash64_pairs
    from scripts_toolkit_spark.io.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    for mult in MULTS:
        parts = [docs] + [
            docs.select(
                (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
                F.concat("text", F.lit(f" v{i}")).alias("text"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        for name, fn in (
            ("minhash", lambda: minhash_lsh_pairs(c)),
            ("simhash64", lambda: simhash64_pairs(c, max_hamming=6)),
        ):
            best, rows = _best2(fn)
            print(f"mult={mult} n_docs={n} {name}: {best:.2f}s pairs={rows}", flush=True)


def probe_ann(spark) -> None:
    from scripts_toolkit_spark.ext.similarity import ivf_topk, ivfpq_topk
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in MULTS:
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        for name, fn in (
            ("ivf", lambda: ivf_topk(c, n_cells=None, n_probe=3, k=3)),
            (
                "ivfpq",
                lambda: ivfpq_topk(
                    c, n_cells=None, n_probe=4, k=3, m=4, sub_dim=16,
                    rerank_factor=8, pq_n_codes=64,
                ),
            ),
        ):
            best, rows = _best2(fn)
            print(f"mult={mult} n_vecs={n} {name}: {best:.2f}s rows={rows}", flush=True)


def probe_spill(spark) -> None:
    """Spilled (n_home=2) vs single-home IVF-PQ at 1×/4× corpus: prices
    the documented 2× candidate-volume trade (wall should stay ≈2× the
    single-home run and scale the same way) next to the recall it buys —
    exact top-3 overlap vs the brute-force baseline at each scale."""
    from scripts_toolkit_spark.ext.similarity import brute_force_topk, ivfpq_topk
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in (m for m in MULTS if m <= 4):
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(c, c, k=3).collect()
        }
        for name, n_home, rf in (("single", 1, 16), ("spilled", 2, 16)):
            t0 = time.time()
            rows = ivfpq_topk(
                c, n_cells=None, n_probe=4, k=3, m=4, sub_dim=16,
                rerank_factor=rf, pq_n_codes=64, n_home=n_home,
            ).collect()
            dt = time.time() - t0
            got = {(r["query_id"], r["neighbor_id"]) for r in rows}
            rec = len(exact & got) / max(len(exact), 1)
            print(
                f"mult={mult} n_vecs={n} ivfpq[{name}]: {dt:.2f}s "
                f"recall={rec:.3f} rows={len(rows)}",
                flush=True,
            )


def probe_sem(spark) -> None:
    """semantic_dedup at 1×/4×/10×: the r7 constant-occupancy sizing must
    hold ~linear wall (the r6-measured √N sizing blew up superlinearly —
    same shape as the exact-in-cell IVF row)."""
    from scripts_toolkit_spark.ext.similarity import semantic_dedup
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in MULTS:
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        best, rows = _best2(lambda: semantic_dedup(c, n_cells=None, tau=0.9))
        print(f"mult={mult} n_vecs={n} semantic_dedup: {best:.2f}s drops={rows}", flush=True)


def probe_sem_extreme(spark) -> None:
    """The DEFAULT semantic_dedup chain past BOTH scale caps (r8: auto
    pick routes to the distributed threshold_centroids, assignment routes
    coarse-to-fine): at 40× sf0.1 (80k vectors, n_cells=1250 — past the
    65536-double codebook cap) the default path must complete with ZERO
    driver-side vector collect; the 10× row (24k vectors — past the pick
    cap only: threshold pick + flat assignment) anchors the wall ratio."""
    from scripts_toolkit_spark.ext.similarity import semantic_dedup
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in (10, 40):
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", (i % 63) + 1, 64 - (i % 63)),
                    F.slice("embedding", 1, i % 63),
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        best, rows = _best2(lambda: semantic_dedup(c, n_cells=None, tau=0.9))
        print(
            f"mult={mult} n_vecs={n} semantic_dedup[default-chain]: {best:.2f}s drops={rows}",
            flush=True,
        )


def probe_two_level(spark) -> None:
    """flat vs two-level assignment at 1×/4×/10× with constant-occupancy
    cell counts (n_cells = N/64, i.e. n_cells GROWS with the corpus): the
    flat path's cost rides N·n_cells affinity work (~N²/64 — superlinear),
    the two-level path rides N·probe·√n_cells (~N^1.5/8 with much smaller
    constants) and must widen its lead as N grows."""
    import math

    from scripts_toolkit_spark.ext.similarity import (
        deterministic_centroids,
        ivf_assign,
        ivf_assign_two_level,
    )
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in MULTS:
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        n_cells = max(16, int(math.ceil(n / 64.0)))
        cents = deterministic_centroids(c, n_cells).localCheckpoint()
        for name, fn in (
            ("flat", lambda: ivf_assign(c, cents, 1)),
            ("two_level", lambda: ivf_assign_two_level(c, cents, super_probe=4)),
        ):
            best, rows = _best2(fn)
            print(
                f"mult={mult} n_vecs={n} n_cells={n_cells} assign[{name}]: "
                f"{best:.2f}s rows={rows}",
                flush=True,
            )


def probe_melt(spark) -> None:
    """melt_to_eav at 60/240/600 value columns over a FIXED 100k-row base
    (round-9 verdict Next #8: prove the unpivot family's claim that
    COLUMNS scale without plan blowup — melt_wide60 only stresses 60).
    Reports, per width: analysis+optimization wall (driver-side plan
    work — the thing that would blow up if each column became its own
    plan branch), optimized-plan size in characters, and executed wall.
    The single `unpivot` per type family lowers to ONE Expand node with
    n_cols projections, so plan size should grow ~linearly in columns
    and execution ~linearly in emitted rows — not combinatorially."""
    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.operators.reshape import melt_to_eav

    base = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    # default maxToStringFields elides long projection lists with "..." —
    # raise it so plan_chars measures the REAL plan text, not a truncation
    spark.conf.set("spark.sql.debug.maxToStringFields", "100000")
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .limit(100_000)
        .select("l_orderkey", "l_linenumber", *base)
        .localCheckpoint()
    )
    for n_cols in (60, 240, 600):
        variants = n_cols // 4
        cols = [(F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rssd")]
        for v in range(variants):
            for b in base:
                cols.append(
                    F.when(
                        (F.col("l_orderkey") + v) % 13 != 0, F.col(b) + F.lit(float(v))
                    ).alias(f"{b}_v{v}")
                )
        type_map = {f"{b}_v{v}": "float" for v in range(variants) for b in base}
        t0 = time.time()
        eav = melt_to_eav(li.select(*cols), type_map, 20240630).select(
            "rssd", "mdrm", "quarter", "data_type", "float_data"
        )
        plan_chars = len(eav._jdf.queryExecution().optimizedPlan().toString())
        analysis_s = time.time() - t0
        best, rows = _best2(lambda: eav)
        print(
            f"n_cols={n_cols} melt: analyze={analysis_s:.2f}s "
            f"plan_chars={plan_chars} exec={best:.2f}s rows={rows}",
            flush=True,
        )


def probe_paths(spark) -> None:
    """expand_paths at 1×/4×/10× the START population over the fixed deep
    taxonomy (13 hops): the round-9 driver-side suffix closure touches the
    corpus-scale starts ONCE, so wall should track the starts linearly
    with a constant closure cost — while the retired O(depth) loop paid
    depth/2 materializations OF the start-scale open-path set."""
    from scripts_toolkit_spark.operators.graph import expand_paths, leaves
    from scripts_toolkit_spark.plans.taxonomy import ROOT, deep_edges

    base = deep_edges(spark, SF_DIR).localCheckpoint()
    for mult in MULTS:
        parts = [base] + [
            base.where(F.col("src").startswith("cc_")).select(
                F.concat(F.lit(f"cc_m{i}_"), F.col("src")).alias("src"), "dst"
            )
            for i in range(1, mult)
        ]
        edges = reduce(lambda a, b: a.unionByName(b), parts).localCheckpoint()
        n_edges = edges.count()
        lv = leaves(edges).where(F.col("node").startswith("cc_"))
        best, rows = _best2(lambda: expand_paths(edges, lv, ROOT, max_depth=15))
        print(
            f"mult={mult} n_edges={n_edges} expand_paths: {best:.2f}s paths={rows}",
            flush=True,
        )


def probe_residual_store(spark, tmp_base: str = "/tmp/spark_graft_probe_resid") -> None:
    """Residual vs plain PQ PERSISTENT-store lifecycle at 1×/4× corpus
    (r11): prices what the stored best-recall configuration costs where
    it is paid — build (codes per COPY instead of per vector), append
    (kernel re-encode wrt stored cells) and compressed search (n_probe
    LUTs per query instead of one, (query, cell)-keyed LUT join) —
    beside the recall each store configuration buys vs brute force."""
    import shutil

    from scripts_toolkit_spark.ext.ann_index import (
        append_to_index,
        build_ann_index,
        search_index,
    )
    from scripts_toolkit_spark.ext.similarity import brute_force_topk
    from scripts_toolkit_spark.io.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for mult in (m for m in MULTS if m <= 4):
        parts = [emb] + [
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
                ).alias("embedding"),
            )
            for i in range(1, mult)
        ]
        c = reduce(lambda a, b: a.unionByName(b), parts).repartition(32).localCheckpoint()
        n = c.count()
        base = c.where(F.col("vec_id") % 5 != 0)
        late = c.where(F.col("vec_id") % 5 == 0)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(c, c, k=3).collect()
        }
        for name, residual in (("plain", False), ("residual", True)):
            path = f"{tmp_base}/{name}_{mult}"
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.time()
            if residual:
                # self-builds the seeded residual codebook (meta-recorded)
                build_ann_index(
                    base, path, n_home=2, residual=True,
                    pq_n_codes=64, m=4, sub_dim=16,
                )
            else:
                # plain PQ: the seeded slice codebook (64 codewords), the
                # same model family the residual build seeds from
                from scripts_toolkit_spark.ext.similarity import (
                    auto_n_cells,
                    deterministic_centroids,
                    normalize_vectors,
                    pq_subspace_codebook,
                )

                normed = normalize_vectors(base).localCheckpoint()
                big = deterministic_centroids(
                    normed, max(auto_n_cells(normed), 64)
                ).localCheckpoint()
                cb = pq_subspace_codebook(
                    big.select(F.col("cell_id").alias("code"), "centroid"),
                    m=4, sub_dim=16,
                )
                build_ann_index(base, path, n_home=2, sub_codebook=cb)
            t_build = time.time() - t0
            t0 = time.time()
            append_to_index(spark, path, late)
            t_append = time.time() - t0
            t0 = time.time()
            rows = search_index(
                spark, path, k=3, n_probe=4, use_pq=True, rerank_factor=16
            ).collect()
            t_search = time.time() - t0
            got = {(r["query_id"], r["neighbor_id"]) for r in rows}
            rec = len(exact & got) / max(len(exact), 1)
            print(
                f"mult={mult} n_vecs={n} store[{name}]: build={t_build:.2f}s "
                f"append={t_append:.2f}s search={t_search:.2f}s recall={rec:.3f}",
                flush=True,
            )
            shutil.rmtree(path, ignore_errors=True)


def probe_spatial_skew(spark) -> None:
    """Hot-cell density skew for the grid radius join (r12 — round-11
    verdict Next #5: operators/spatial.py claims density skew is
    'ordinary key skew — AQE skew-split or salting applies unchanged';
    this probe MEASURES it instead of asserting it). Points follow the
    spatial_radius_pairs recipe (md5-derived coords over a 10°x10°
    extent); the HOT variant moves 30% of all points into ONE
    radius-sized cell (a planted hot city). Walls compared at 1x and 4x
    density: uniform vs hot with AQE as configured, hot with AQE
    skew-join disabled, and hot through an explicitly SALTED build of
    the same candidate pipeline (probe side replicated over 16 salts,
    build side salted by id hash — `operators/joins.salted_join`'s
    recipe applied to the composite (cy, cx) key).

    Interpretation note recorded with the numbers in SCALING.md: a hot
    cell with h points emits ~h² candidate pairs NO MATTER the
    partitioning — skew handling (AQE split or salting) redistributes
    that refine work across reducers, it cannot shrink it. The quadratic
    candidate volume is intrinsic to radius semantics in a dense cell;
    the probe shows whether redistribution (not volume) is the
    bottleneck at this scale."""
    from scripts_toolkit_spark.operators.spatial import grid_radius_join

    radius = 0.15
    hex8 = lambda pref: (  # noqa: E731
        F.conv(
            F.substring(F.md5(F.concat(F.lit(pref), F.col("c_custkey").cast("string"))), 1, 8),
            16, 10,
        ).cast("long") % 1000000
    ) / 1000000.0 * 10.0

    from scripts_toolkit_spark.io.catalog import load_table

    cust = load_table(spark, SF_DIR, "customer").select("c_custkey")
    for mult in (m for m in MULTS if m <= 4):
        parts = [cust] + [
            cust.select((F.col("c_custkey") + 10_000_000 * i).alias("c_custkey"))
            for i in range(1, mult)
        ]
        ids = reduce(lambda a, b: a.unionByName(b), parts)
        base = ids.select(
            F.col("c_custkey").alias("point_id"),
            hex8("lat|").alias("lat"),
            hex8("lon|").alias("lon"),
        )
        hot_flag = F.col("point_id") % 10 < 3  # 30% of points
        hot = base.select(
            "point_id",
            F.when(hot_flag, F.col("lat") * 0.0149).otherwise(F.col("lat")).alias("lat"),
            F.when(hot_flag, F.col("lon") * 0.0149).otherwise(F.col("lon")).alias("lon"),
        )
        uni_pts = base.repartition(32).localCheckpoint()
        hot_pts = hot.repartition(32).localCheckpoint()
        n = uni_pts.count()

        def _salted(points, salts: int = 16):
            cy = F.floor(F.col("lat") / F.lit(radius)).cast("long")
            cx = F.floor(F.col("lon") / F.lit(radius)).cast("long")
            b = points.select(
                F.col("point_id").alias("id_b"), F.col("lat").alias("lat_b"),
                F.col("lon").alias("lon_b"), cy.alias("jcy"), cx.alias("jcx"),
                (F.pmod(F.hash("point_id"), F.lit(salts))).alias("__salt"),
            )
            offs = F.array(*[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            ])
            p = (
                points.select(
                    F.col("point_id").alias("id_a"), F.col("lat").alias("lat_a"),
                    F.col("lon").alias("lon_a"), cy.alias("cy"), cx.alias("cx"),
                    F.explode(offs).alias("o"),
                )
                .select(
                    "id_a", "lat_a", "lon_a",
                    (F.col("cy") + F.col("o.dy")).alias("jcy"),
                    (F.col("cx") + F.col("o.dx")).alias("jcx"),
                    F.explode(F.sequence(F.lit(0), F.lit(salts - 1))).alias("__salt"),
                )
            )
            dlat, dlon = F.col("lat_a") - F.col("lat_b"), F.col("lon_a") - F.col("lon_b")
            d2 = dlat * dlat + dlon * dlon
            return (
                p.join(b, ["jcy", "jcx", "__salt"])
                .where(F.col("id_a") < F.col("id_b"))
                .where(d2 <= F.lit(radius) * F.lit(radius))
                .select("id_a", "id_b")
            )

        for label, fn, conf in (
            ("uniform/aqe", lambda: grid_radius_join(uni_pts, radius), None),
            ("hot/aqe", lambda: grid_radius_join(hot_pts, radius), None),
            ("hot/no-skewjoin", lambda: grid_radius_join(hot_pts, radius),
             ("spark.sql.adaptive.skewJoin.enabled", "false")),
            ("hot/salted16", lambda: _salted(hot_pts), None),
        ):
            if conf:
                old = spark.conf.get(conf[0], None)
                spark.conf.set(conf[0], conf[1])
            try:
                best, rows = _best2(fn)
            finally:
                if conf:
                    spark.conf.set(conf[0], old if old is not None else "true")
            print(
                f"mult={mult} n={n} spatial[{label}]: {best:.2f}s pairs={rows}",
                flush=True,
            )


def probe_build_stages(spark, tmp_base: str = "/tmp/spark_graft_probe_bstage") -> None:
    """Plain-build wall decomposition (r12 — round-11 verdict Next #3: the
    ann_index_build warm creep 1.95 s r7 → 3.1 r10 → 3.7 r11 needed a
    committed attribution). Times each stage of the plain (non-PQ)
    `build_ann_index` separately — corpus normalize+materialize, stats
    job, centroid pick, model writes, assign+corpus write — then times
    the real `build_ann_index` and a NO-materialize variant of the same
    stage sequence for the boundary A/B.

    Findings this probe exists to reproduce (SCALING.md "build-wall
    attribution"): the corpus localCheckpoint is a WIN at bench scale
    (the stats/pick/assign jobs read RAM instead of re-scanning parquet;
    removing it measured ~+50% on build warm min), the dominant stage is
    assign+write, and the r10/r11 creep is JOB-COUNT overhead (the meta
    write added in r10, widened in r11; ~0.3-1 s fixed cost per job on
    this host). A coalesce(1) "fix" for the 32-slice literal model
    writes was tried and REVERTED: one coalesced task streams all 32
    Python-serialized parent partitions sequentially (~5 s per KB
    write vs 0.5 s plain) — see SCALING.md for the A/B."""
    import shutil

    from scripts_toolkit_spark.ext.ann_index import build_ann_index
    from scripts_toolkit_spark.ext.similarity import (
        auto_n_cells,
        corpus_stats,
        deterministic_centroids,
        ivf_assign,
        normalize_vectors,
    )
    from scripts_toolkit_spark.io.catalog import load_table
    from scripts_toolkit_spark.materialize import materialize as _mat

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    emb.count()  # warm the scan
    par = spark.sparkContext.defaultParallelism

    def _stages(with_boundary: bool) -> dict:
        path = tmp_base + "/store"
        shutil.rmtree(tmp_base, ignore_errors=True)
        t: dict[str, float] = {}
        t0 = time.time()
        normed = normalize_vectors(emb.repartition(par))
        if with_boundary:
            normed = normed.transform(_mat)
        t["normalize" + ("+mat" if with_boundary else "")] = time.time() - t0
        t0 = time.time()
        n_rows, dim = corpus_stats(normed, "embedding")
        t["stats"] = time.time() - t0
        t0 = time.time()
        n_cells = auto_n_cells(normed, n_rows=n_rows)
        cents = deterministic_centroids(normed, n_cells, n_rows=n_rows)
        t["pick"] = time.time() - t0
        t0 = time.time()
        cents.write.mode("overwrite").parquet(path + "/centroids")
        spark.createDataFrame(
            [(1, False)], "n_home int, residual boolean"
        ).write.mode("overwrite").parquet(path + "/meta")
        t["model_writes"] = time.time() - t0
        t0 = time.time()
        (
            ivf_assign(normed, cents, 1, with_rank=True, n_cells=n_cells, dim=dim)
            .select("vec_id", "embedding", "cell_id", "probe_rank")
            .withColumn("batch_id", F.lit(-1).cast("bigint"))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(path + "/vectors")
        )
        t["assign+write"] = time.time() - t0
        return t

    for label, flag in (("boundary", True), ("no_boundary", False)):
        for rep in range(2):
            t = _stages(flag)
            print(
                f"build_stages[{label}] rep={rep} "
                + " ".join(f"{k}={v:.2f}s" for k, v in t.items())
                + f" total={sum(t.values()):.2f}s",
                flush=True,
            )
    import shutil as _sh

    for rep in range(3):
        _sh.rmtree(tmp_base, ignore_errors=True)
        t0 = time.time()
        build_ann_index(emb, tmp_base + "/real")
        print(f"build_ann_index rep={rep} wall={time.time() - t0:.2f}s", flush=True)
    _sh.rmtree(tmp_base, ignore_errors=True)


def probe_closure_cap(spark) -> None:
    """Round-10 verdict Next #7: price the closure-cap fallback cliff.
    Builds a taxonomy whose INTERNAL edge domain exceeds
    _CLOSURE_EDGE_CAP (100k) — W parallel depth-D chains to one root —
    and measures (a) the auto-fallback shuffle loop that actually runs
    past the cap, and (b) the driver-side closure on the SAME graph with
    the cap lifted, so SCALING.md can state what the guard costs when it
    trips instead of asserting the fallback is merely correct."""
    from scripts_toolkit_spark.operators import graph as graph_mod

    W, D = 12_000, 10  # internal edges ≈ W·D = 120k > the 100k cap
    w = spark.range(W).select(F.col("id").cast("string").alias("w"))
    hops = [
        F.struct(
            F.concat(F.lit(f"m{i}_"), F.col("w")).alias("src"),
            F.concat(F.lit(f"m{i + 1}_"), F.col("w")).alias("dst"),
        )
        for i in range(D)
    ] + [
        F.struct(F.concat(F.lit(f"m{D}_"), F.col("w")).alias("src"), F.lit("root").alias("dst")),
        F.struct(F.concat(F.lit("s_"), F.col("w")).alias("src"),
                 F.concat(F.lit("m0_"), F.col("w")).alias("dst")),
    ]
    edges = (
        w.select(F.explode(F.array(*hops)).alias("e"))
        .select("e.src", "e.dst")
        .localCheckpoint()
    )
    starts = w.select(F.concat(F.lit("s_"), F.col("w")).alias("node")).localCheckpoint()
    n_internal = (
        edges.join(edges.select(F.col("dst").alias("src")).distinct(), "src", "left_semi")
        .count()
    )
    print(f"internal_edges={n_internal} cap={graph_mod._CLOSURE_EDGE_CAP}", flush=True)
    assert n_internal > graph_mod._CLOSURE_EDGE_CAP

    best_loop, rows_loop = _best2(
        lambda: graph_mod.expand_paths(edges, starts, "root", max_depth=16)
    )
    print(f"over-cap auto-fallback (shuffle loop): {best_loop:.2f}s paths={rows_loop}", flush=True)

    saved = graph_mod._CLOSURE_EDGE_CAP
    graph_mod._CLOSURE_EDGE_CAP = 10_000_000
    try:
        best_clo, rows_clo = _best2(
            lambda: graph_mod.expand_paths(edges, starts, "root", max_depth=16)
        )
    finally:
        graph_mod._CLOSURE_EDGE_CAP = saved
    print(f"cap lifted (driver closure):           {best_clo:.2f}s paths={rows_clo}", flush=True)
    assert rows_loop == rows_clo


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = _spark()
    if what in ("docs", "all"):
        probe_docs(spark)
    if what in ("paths", "all"):
        probe_paths(spark)
    if what in ("ann", "all"):
        probe_ann(spark)
    if what in ("spill", "all"):
        probe_spill(spark)
    if what in ("sem", "all"):
        probe_sem(spark)
    if what in ("sem_extreme", "all"):
        probe_sem_extreme(spark)
    if what in ("two_level", "all"):
        probe_two_level(spark)
    if what in ("melt", "all"):
        probe_melt(spark)
    if what in ("closure_cap", "all"):
        probe_closure_cap(spark)
    if what in ("build_stages", "all"):
        probe_build_stages(spark)
    if what in ("spatial_skew", "all"):
        probe_spatial_skew(spark)
    if what in ("residual_store", "all"):
        probe_residual_store(spark)
