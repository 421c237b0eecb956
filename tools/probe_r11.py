"""Round-11 10x scale probes (VERDICT r10 #7 + the r11 operators):
streaming-Avro merge state growth, lake fsck at 10x file counts,
PSI / bot-gap-CV window aggregations, TextRank iteration cost vs
graph size, tiled+compressed GeoTIFF decode, lossy 9/7 J2K decode,
and the gpshub position store. SCALE.md discipline: min-of-2 in one
session; linear growth or bust."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
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


# --- lake fsck shape: txn-log latest-state FULL OUTER physical listing ------
def fsck(scale):
    n = 20_000 * scale
    log = spark.range(n * 3).select(
        (F.col("id") % n).alias("file_id"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 5 == 0, F.lit("remove"))
         .otherwise(F.lit("add")).alias("op"),
        (F.col("id") % 997 * 37).alias("size_bytes"),
    )
    disk = spark.range(n).filter(F.col("id") % 11 != 3).select(
        F.col("id").alias("file_id"), F.lit(1).alias("on_disk")
    )
    state = log.groupBy("file_id").agg(
        F.max_by("op", "seq").alias("op"),
        F.max_by("size_bytes", "seq").alias("size_bytes"),
    )
    j = state.join(disk, "file_id", "full_outer")
    j.groupBy("op", F.col("on_disk").isNotNull().alias("present")).agg(
        F.count(F.lit(1)), F.sum("size_bytes")
    ).collect()


# --- PSI drift: two-window binned shares ------------------------------------
def psi(scale):
    n = 200_000 * scale
    df = spark.range(n).select(
        (F.col("id") % 2).alias("win"),
        ((F.col("id") * 37) % 1000).alias("v"),
    )
    b = df.select("win", F.floor(F.col("v") / 100).alias("bin"))
    shares = b.groupBy("win", "bin").agg(F.count(F.lit(1)).alias("n"))
    tot = shares.groupBy("win").agg(F.sum("n").alias("t"))
    s = shares.join(tot, "win").select(
        "bin", "win", (F.col("n") / F.col("t")).alias("p")
    )
    a = s.filter("win = 0").select("bin", F.col("p").alias("pa"))
    c = s.filter("win = 1").select("bin", F.col("p").alias("pb"))
    a.join(c, "bin").select(
        F.sum((F.col("pa") - F.col("pb"))
              * F.log(F.col("pa") / F.col("pb"))).alias("psi")
    ).collect()


# --- bot regularity: per-key inter-event gap CV window agg ------------------
def botcv(scale):
    from pyspark.sql import Window as W
    n = 200_000 * scale
    ev = spark.range(n).select(
        (F.col("id") % (2_000 * scale)).alias("k"),
        (F.col("id") * 631 % 1_000_000).alias("ts"),
    )
    w = W.partitionBy("k").orderBy("ts")
    g = ev.select("k", (F.col("ts") - F.lag("ts").over(w)).alias("gap"))
    g.groupBy("k").agg(
        (F.stddev_samp("gap") / F.avg("gap")).alias("cv")
    ).filter("cv < 0.05").count()


# --- TextRank: co-occurrence graph + integer pagerank iterations ------------
from odin_rs_spark.operators.graph import integer_pagerank  # noqa: E402


def textrank(scale):
    # co-occurrence graphs are symmetric: ring + 2-chords, both ways
    n = 5_000 * scale
    e = spark.range(n).select(F.col("id").alias("src"))
    edges = None
    for d in (1, 2):
        fwd = e.select("src", ((F.col("src") + d) % n).alias("dst"))
        rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        for nx in (fwd, rev):
            edges = nx if edges is None else edges.unionAll(nx)
    integer_pagerank(edges, iterations=6).agg(F.sum("mass")).collect()


# --- tiled+compressed GeoTIFF decode (mapInPandas kernel) -------------------
from odin_rs_spark.sources.geotiff import geotiff_grid_cells, write_geotiff  # noqa: E402

import tempfile  # noqa: E402

_TDIR = tempfile.mkdtemp(prefix="probe_r11_tif_")
_TIFS = {}
for scale in (1, 10):
    files = []
    jj, ii = np.mgrid[0:64, 0:96]
    v = ((ii * 17 + jj * 23) % 700).astype(float)
    for k in range(2 * scale):
        p = f"{_TDIR}/t{scale}_{k}.tif"
        write_geotiff(p, v, 37.0, -120.0 + k, -0.01, 0.01, dtype="i2",
                      compression="deflate", predictor=2, tile=(32, 16))
        files.append(p)
    _TIFS[scale] = files


def tifscan(scale):
    files = spark.read.format("binaryFile").load(_TIFS[scale])
    geotiff_grid_cells(files).agg(F.sum("value"), F.count(F.lit(1))).collect()


# --- lossy 9/7 J2K decode (grib2 DRT 5.40 ctype 1) --------------------------
from odin_rs_spark.sources.grib2 import grib2_grid_cells, write_grib2_jpeg2000  # noqa: E402

_GDIR = tempfile.mkdtemp(prefix="probe_r11_g2_")
_GRIBS = {}
jj, ii = np.mgrid[0:64, 0:96]
_vals = ((3 * ii * ii + 5 * jj * jj + 7 * ii * jj) % 4096).astype(float) * 0.25
for scale in (1, 10):
    files = []
    for k in range(scale):
        p = f"{_GDIR}/g{scale}_{k}.grib2"
        write_grib2_jpeg2000(p, _vals, 40.0, -105.0 + k, -0.03, 0.03,
                             e_scale=-2, nbits=12, lossy=True, qstep=1.0)
        files.append(p)
    _GRIBS[scale] = files


def j2kscan(scale):
    files = spark.read.format("binaryFile").load(_GRIBS[scale])
    grib2_grid_cells(files).agg(F.sum("value"), F.count(F.lit(1))).collect()


# --- gpshub position store: batch-equivalent keyed latest agg ---------------
def gpsstore(scale):
    n = 200_000 * scale
    ev = spark.range(n).select(
        (F.col("id") % (5_000 * scale)).cast("string").alias("key"),
        F.col("id").alias("ts"),
        (F.col("id") % 180).cast("double").alias("lat"),
        (F.col("id") % 360).cast("double").alias("lon"),
    )
    ev.groupBy("key").agg(
        F.max_by("lat", "ts"), F.max_by("lon", "ts"),
        F.count(F.lit(1)).alias("n"),
    ).agg(F.sum("n")).collect()


# --- streaming-Avro merge shape: per-batch snapshot upsert (anti-join) ------
def avromerge(scale):
    # snapshot_delta_sink's per-micro-batch work: snapshot LEFT ANTI
    # batch + union — cost tracks SNAPSHOT size, state never collects
    # to the driver
    n = 100_000 * scale
    snap = spark.range(n).select(F.col("id").alias("key"),
                                 F.col("id").alias("v"))
    batch = spark.range(n // 10).select(
        ((F.col("id") * 7) % n).alias("key"), F.col("id").alias("v")
    )
    snap.join(batch, "key", "left_anti").unionAll(batch).agg(
        F.count(F.lit(1)), F.sum("v")
    ).collect()


if __name__ == "__main__":
    run("avro_stream_merge", avromerge)
    run("lake_fsck", fsck)
    run("psi_drift", psi)
    run("bot_gap_cv", botcv)
    run("textrank_pagerank", textrank)
    run("tiled_geotiff_scan", tifscan)
    run("lossy_j2k_scan", j2kscan)
    run("gpshub_store", gpsstore)
