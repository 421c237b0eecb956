"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of queries against
the corpus with a JVM dot product (zip_with + aggregate), then per-query
rank. Exact, and at 100 TB the corpus side stays partitioned while the
(small) query side broadcasts: no corpus shuffle at all.

Scale path: LSH random-hyperplane bucketing — sign-bit signature on H
deterministic hyperplanes → equi-join on bucket → exact re-rank within
candidates. Hyperplane components derive from xxhash64(dim, plane) so the
"random" planes are reproducible with no driver-side RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    queries: (query_id, embedding). Broadcast the query side; corpus scans
    once with no shuffle until the final per-query rank (tiny: q·k rows
    after partial top-k under AQE).
    Output: (query_id, vec_id, cos_sim, rank); self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col).alias("__cvec"))
        .join(q, F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def hyperplane_signature(
    vec: Column, num_planes: int = 16, dim: int = 64, seed: int = 0
) -> Column:
    """Deterministic random-hyperplane sign signature (int bucket id).

    Plane p component d = xxhash64(d, p, seed) scaled to [-1,1] —
    reproducible across runs/executors without shipping a matrix;
    distinct seeds give independent hash tables.
    """
    planes = [
        F.array(
            *[
                (F.xxhash64(F.lit(d), F.lit(p), F.lit(seed)) % 100003).cast("double")
                / 100003.0
                for d in range(dim)
            ]
        )
        for p in range(num_planes)
    ]
    bits = [
        F.when(dot(vec, plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_planes: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate NN: multi-table sign-LSH (standard L×b scheme) with
    exact re-rank over the union of probed buckets.

    A single hyperplane table collapses for moderate-similarity
    neighbors (cos≈0.33 → per-plane agreement ≈0.6 → 0.6^b per table);
    L independent tables raise candidate recall to 1-(1-p^b)^L while
    each join stays an equi-join on (table, bucket). Tune: more tables →
    recall; more planes/bits → precision (smaller buckets). The corpus
    side is exploded ×L (8 small int columns per row — cheap vs the
    vectors themselves); at 100 TB persist the exploded index bucketed
    by (table, bucket).
    """
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                hyperplane_signature(F.col(vec_col), num_planes, dim, seed=t).alias(
                    "bucket"
                ),
            )
            for t in range(num_tables)
        ]
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("__cvec"), F.explode(tables).alias("__t")
    ).select(id_col, "__cvec", "__t.tbl", "__t.bucket")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("tbl"),
                            hyperplane_signature(
                                F.col(vec_col), num_planes, dim, seed=t
                            ).alias("bucket"),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("__t"),
        ).select(query_id_col, "__qvec", "__t.tbl", "__t.bucket")
    )
    cand = (
        c.join(q, ["tbl", "bucket"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .dropDuplicates([query_id_col, id_col])
        .withColumn("cos_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-style ANN: KMeans-partition the corpus, probe the nprobe
    nearest centroids per query, exact re-rank inside probed cells.

    Uses pyspark.ml KMeans to fit centroids (one pass over a sample at
    scale); corpus cell assignment is a broadcast-centroid argmin — the
    inverted-file layout means each query touches nprobe/num_centroids of
    the corpus.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    corpus_v = corpus.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("__features")
    )
    km = KMeans(k=num_centroids, seed=seed, featuresCol="__features", predictionCol="__cell")
    model = km.fit(corpus_v)
    assigned = model.transform(corpus_v).select(
        F.col(id_col), F.col(vec_col).alias("__cvec"), F.col("__cell")
    )

    centroids = [c.tolist() for c in model.clusterCenters()]
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], ["__cell", "__centroid"]
    )
    # nprobe nearest centroids per query (centroid count is tiny → broadcast NLJ)
    qc = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qvec"))
        .crossJoin(F.broadcast(cent_df))
        .withColumn("__d", cosine(F.col("__qvec"), F.col("__centroid")))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("__d").desc())
    probes = (
        qc.withColumn("__pr", F.row_number().over(wq))
        .filter(F.col("__pr") <= nprobe)
        .select(query_id_col, "__qvec", "__cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "__cell")
        .filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", cosine(F.col("__qvec"), F.col("__cvec")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
