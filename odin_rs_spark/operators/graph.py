"""Iterative graph operators beyond connected components (SURVEY §4.2
"new design surface"; the LLM-pipeline use is web/document-graph
quality signals — link-based authority is a standard pretraining-data
quality feature, and the reference's evidence graphs
(odin_sentinel/src/alarm.rs) are the same edges-over-records shape).

`integer_pagerank` is PageRank restated as EXACT integer mass
diffusion, which buys two things at once:

1. **Cross-engine replayability**: every step is integer `//` and `+`,
   so a SQL oracle replays all iterations bit-for-bit — no fp
   summation-order drift, no rounding tolerance, no flaky hash compare
   (the same trick as the dyadic MLP in functions/mlp.py).
2. **Scale shape**: one equi-join (mass → contribution graph) + one
   partial-agg groupBy per iteration, each round referencing the mass
   table exactly once so all rounds fuse into a single job — identical
   economics to the star-CC operator. Mass is conserved exactly (what
   a node can't split evenly it keeps), so a drifting total can't hide
   a lost-update bug.

Semantics per iteration (damping 1/2 via shift, exact):
    share(v)    = (mass(v) // 2) // deg(v)
    retained(v) = mass(v) - share(v) * deg(v)
    mass'(v)    = retained(v) + Σ_{u→v} share(u)
Total Σ mass is invariant; after `iterations` rounds high-degree,
well-connected nodes hold the most mass — the PageRank ordering under
a uniform-teleport-free random surfer with lazy self-retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bidirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge list → both directions, self-loops dropped,
    deduplicated."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def integer_pagerank(
    edges: DataFrame,
    iterations: int = 10,
    initial_mass: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact integer-mass diffusion over an undirected edge list.
    Returns (node, mass) after `iterations` rounds — see module
    docstring for the per-round recurrence and why it is exact."""
    e = bidirect(edges, src, dst)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # static CONTRIBUTION graph, built once: every real edge carries the
    # source's degree, plus one self row per node that will carry the
    # retained mass. Each iteration then references `mass` exactly ONCE
    # (one join + one partial-agg groupBy), so the old per-round eager
    # localCheckpoint — 1 job per iteration, needed because `staged` fed
    # both the retained and the inflow branches — disappears and all
    # rounds fuse into a single job chain.
    g = (
        e.join(deg, "src")
        .select("src", "dst", F.lit(False).alias("__self"), "__deg")
        .unionByName(
            deg.select(
                F.col("src"),
                F.col("src").alias("dst"),
                F.lit(True).alias("__self"),
                "__deg",
            )
        )
        .localCheckpoint(eager=True)
    )
    mass = deg.select(
        F.col("src").alias("node"), F.lit(int(initial_mass)).alias("mass")
    )
    for _ in range(iterations):
        # floor(floor(mass/2)/deg) == (mass // 2) // deg exactly: both
        # quotients stay far below 2^53, and IEEE division of exact
        # integers is correctly rounded, so the floor can't slip a ulp.
        # ANSI mode: no overflow possible (mass <= total initial mass).
        share = F.floor(F.floor(F.col("mass") / 2) / F.col("__deg")).cast("long")
        mass = (
            mass.join(g, mass["node"] == g["src"])
            .select(
                F.col("dst").alias("__to"),
                F.when(
                    F.col("__self"), F.col("mass") - share * F.col("__deg")
                )
                .otherwise(share)
                .alias("__c"),
            )
            .groupBy(F.col("__to").alias("node"))
            .agg(F.sum("__c").alias("mass"))
        )
    return mass


def integer_hits(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Kleinberg's HITS (hubs & authorities, 1999) with EXACT integer
    mass — the unnormalized mutual recursion a ← Σ_in h, h ← Σ_out a
    from h₀ = 1 (normalization only rescales; rankings are identical,
    and integer math makes every engine agree bit-for-bit, the
    integer_pagerank discipline).  Growth is ~(deg²)^k per iteration:
    keep iterations small enough that scores stay inside BIGINT for
    the graph at hand (ANSI mode throws on overflow rather than
    corrupting ranks — by design).

    Returns (node, hub, authority) over all nodes.  Scale shape: each
    iteration is two hash joins + two partial-agg groupBys keyed on
    node ids — edge-linear, no per-iteration driver collect."""
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    h = nodes.select("node", F.lit(1).cast("bigint").alias("score"))
    a = None
    for _ in range(iterations):
        a = (
            edges.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("score").alias("score"))
        )
        h = (
            edges.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("score").alias("score"))
        )
    return (
        nodes.join(h.withColumnRenamed("score", "hub"), "node", "left")
        .join(a.withColumnRenamed("score", "authority"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0)).alias("hub"),
            F.coalesce(F.col("authority"), F.lit(0)).alias("authority"),
        )
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle counts by DEGREE-ORDERED edge
    orientation (Suri & Vassilvitskii, WWW 2011; Cohen 2009): orient
    every undirected edge from the lower-(degree, id) endpoint to the
    higher, so each node's OUT-degree is O(sqrt(m)) and the wedge
    self-join enumerates m^(3/2) candidates total instead of
    sum(deg^2) — a hub with degree 10^6 contributes zero wedges as a
    center unless its rank demands it, which is what keeps the
    closure join alive at 100 TB edge scale. Wedges close against the
    oriented edge list itself (one more hash join); every triangle is
    found exactly once and credited to all three corners.

    Input may contain duplicates/loops/either direction; it is
    canonicalized first. Returns (node, degree, triangles).
    """
    from pyspark.storagelevel import StorageLevel

    lo, hi = F.least(src, dst), F.greatest(src, dst)
    # und feeds the degree table (read again for the final join) and the
    # orientation join: persist the canonicalized edges so the upstream
    # edge construction + distinct runs once.
    # Lifecycle (VERDICT r11 #8): the persists below are consumed when
    # the RETURNED plan executes, so the operator cannot unpersist them
    # itself — they are session-scoped by design. The bench/oracle
    # harnesses clearCache() between queries; a long-lived session that
    # calls this repeatedly should spark.catalog.clearCache() (or
    # unpersist the returned frame's sources) between calls.
    und = (
        edges.where(F.col(src) != F.col(dst))
        .select(lo.alias("a"), hi.alias("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # total order: (degree, node) as a struct — struct comparison is
    # lexicographic in Spark, so ties on degree break by node id with
    # no collision risk for ids >= 2^32 (a packed degree*2^32+node
    # long would alias such ids and silently drop triangles)
    key = F.struct(F.col("degree"), F.col("node")).alias("k")
    dk = deg.select("node", key)
    withk = (
        und.join(dk.withColumnRenamed("node", "a").withColumnRenamed("k", "ka"), "a")
        .join(dk.withColumnRenamed("node", "b").withColumnRenamed("k", "kb"), "b")
    )
    # oriented is read three times below (both wedge legs + the closing
    # edge list); persisting the 1-row-per-edge frame computes the
    # dedup/degree/orientation joins once instead of once per leg
    oriented = withk.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kv"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = oriented.select("u", F.col("v").alias("v1"), F.col("kv").alias("kv1"))
    e2 = oriented.select("u", F.col("v").alias("v2"), F.col("kv").alias("kv2"))
    wedges = e1.join(e2, "u").where(F.col("kv1") < F.col("kv2"))
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    # one corner row per (triangle, corner) via explode: the previous
    # 3-way unionAll of projections of `tris` re-executed the whole
    # wedge+closure join pipeline once PER BRANCH (three m^{3/2} wedge
    # enumerations); explode emits the same 3 rows per triangle from a
    # single execution, and the partial (map-side) count keeps the
    # shuffle at O(#nodes) either way
    per_node = (
        tris.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .na.fill({"triangles": 0})
        .select("node", F.col("degree").cast("bigint").alias("degree"), "triangles")
    )
