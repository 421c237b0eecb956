"""Round-10 10x scale probes (VERDICT r9 #8 + the new r10 codecs):
ddsketch_build, integer_hits, z-order/hilbert layout keys,
record-linkage CC, grid-DBSCAN, plus hdf5_grid_cells and
zstd_decompress. SCALE.md discipline: min-of-2 in one session; linear
growth or bust."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from odin_rs_spark.deploy import ensure_shipped  # noqa: E402

ensure_shipped(spark)


def run(name, fn, scales=(1, 10)):
    for scale in scales:
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(scale)
            times.append(time.time() - t0)
        print(f"{name} x{scale}: {min(times):.2f} s", flush=True)


# --- ddsketch_build -> quantiles ------------------------------------------
from odin_rs_spark.operators.sketches import ddsketch_build, ddsketch_quantiles  # noqa: E402


def dd(scale):
    df = spark.range(60_000 * scale).select(
        (F.col("id") % 8).cast("int").alias("g"),
        (F.abs(F.hash("id")) % 100000 + 1).cast("double").alias("v"),
    )
    sk = ddsketch_build(df, "v", ["g"])
    ddsketch_quantiles(sk, ["g"], [(50, 100), (99, 100)]).collect()


run("ddsketch 60k->600k", dd)

# --- integer HITS -----------------------------------------------------------
from odin_rs_spark.operators.graph import integer_hits  # noqa: E402


def hits(scale):
    n = 2000 * scale
    edges = spark.range(n * 5).select(
        (F.abs(F.hash("id")) % n).alias("src"),
        (F.abs(F.hash(F.col("id") + 1)) % n).alias("dst"),
    )
    integer_hits(edges, iterations=3).agg(F.count(F.lit(1))).collect()


run("integer_hits 10k->100k edges", hits)

# --- z-order / hilbert keys --------------------------------------------------
from odin_rs_spark.operators.layout import hilbert_append, z_order_key  # noqa: E402


def zorder(scale):
    df = spark.range(100_000 * scale).select(
        (F.abs(F.hash("id")) % 1024).cast("int").alias("a"),
        (F.abs(F.hash(F.col("id") + 7)) % 1024).cast("int").alias("b"),
    )
    df.select(z_order_key([F.col("a"), F.col("b")], bits=10).alias("z")).agg(
        F.sum("z")).collect()


def hilbert(scale):
    df = spark.range(100_000 * scale).select(
        (F.abs(F.hash("id")) % 1024).cast("int").alias("a"),
        (F.abs(F.hash(F.col("id") + 7)) % 1024).cast("int").alias("b"),
    )
    hilbert_append(df, F.col("a"), F.col("b"), bits=10).agg(
        F.sum("hkey")).collect()


run("zorder_key 100k->1M", zorder)
run("hilbert_append 100k->1M", hilbert)

# --- record linkage (blocking + levenshtein + CC, the q268 shape) -----------
from odin_rs_spark.operators.dedup import connected_components  # noqa: E402


def linkage(scale):
    n = 2000 * scale
    recs = spark.range(n).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("name"),
                 F.lpad((F.col("id") % (n // 2)).cast("string"), 7, "0"),
                 F.when(F.col("id") % 2 == 0, F.lit("z")).otherwise(F.lit("q"))
                 ).alias("name"),
    ).withColumn("block", F.substring("name", 1, 9))
    a = recs.select("block", F.col("rid").alias("id_a"),
                    F.col("name").alias("na"))
    b = recs.select("block", F.col("rid").alias("id_b"),
                    F.col("name").alias("nb"))
    pairs = a.join(b, "block").where(
        (F.col("id_a") < F.col("id_b"))
        & (F.levenshtein(F.col("na"), F.col("nb")) <= 1)
    ).select("id_a", "id_b")
    connected_components(pairs).agg(F.count(F.lit(1))).collect()


# --- grid-DBSCAN (the q269 shape: cell counts -> neighbor CC) ----------------


def dbscan(scale):
    n = 20_000 * scale
    side = 64 * scale  # grid grows with data: constant density
    pts = spark.range(n).select(
        (F.abs(F.hash("id")) % side).alias("px"),
        (F.abs(F.hash(F.col("id") + 3)) % side).alias("py"),
    )
    cells = pts.groupBy("px", "py").agg(F.count(F.lit(1)).alias("n_pts"))
    core = cells.where(F.col("n_pts") >= 4).withColumn(
        "cell", F.col("px") * side + F.col("py"))
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         if not (dx == 0 and dy == 0)], "dx int, dy int")
    nbr = core.crossJoin(F.broadcast(offs)).select(
        F.col("cell").alias("id_a"),
        ((F.col("px") + F.col("dx")) * side
         + F.col("py") + F.col("dy")).alias("id_b"))
    core_ids = core.select(F.col("cell").alias("id_b"))
    edges = nbr.join(core_ids, "id_b").where(F.col("id_a") < F.col("id_b"))
    connected_components(edges).agg(F.count(F.lit(1))).collect()


# --- r10 codecs --------------------------------------------------------------
from odin_rs_spark.sources.hdf5 import hdf5_grid_cells, write_hdf5  # noqa: E402


def hdf5(scale):
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="probe_hdf5_")
    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    for g in range(10 * scale):
        write_hdf5(
            os.path.join(d, f"g{g}.nc"), [("y", 48), ("x", 64)],
            {"CMI": (["y", "x"], ((xx * 37 + yy * 23 + g) % 89).astype("<i2")),
             "DQF": (["y", "x"], ((xx * 7 + yy * 11 + g) % 4).astype("<i1"))},
            chunks={"CMI": (16, 16)}, compress={"CMI": 6},
        )
    files = spark.read.format("binaryFile").load(d)
    hdf5_grid_cells(files, "CMI", mask_var="DQF", mask_min=2.0).agg(
        F.count(F.lit(1))).collect()
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def zstd(scale):
    from odin_rs_spark.sources.zstdcodec import (
        zstd_compress_store,
        zstd_decompress,
    )

    def _mk(series):
        out = []
        for mid in series:
            body = (f"doc {int(mid)} " * 200).encode()
            out.append(zstd_compress_store(body))
        return pd.Series(out)

    from pyspark.sql.types import BinaryType

    mk = F.pandas_udf(_mk, BinaryType())
    media = spark.range(500 * scale).select(mk(F.col("id")).alias("content"))

    def fn(batches):
        for pdf in batches:
            ns = [len(zstd_decompress(bytes(c))) for c in pdf["content"]]
            yield pd.DataFrame({"n": ns})

    media.mapInPandas(fn, "n int").agg(F.sum("n")).collect()


for name, fn in (("record_linkage 2k->20k", linkage),
                 ("grid_dbscan 20k->200k", dbscan),
                 ("hdf5_grid_cells 10->100 granules", hdf5),
                 ("zstd_decompress 500->5000 members", zstd)):
    try:
        run(name, fn)
    except Exception as exc:  # probe harness: report, keep probing
        print(f"{name}: ERROR {type(exc).__name__}: {exc}", flush=True)
