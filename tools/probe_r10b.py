"""Round-10 continuation 10x scale probes for the new operators:
kmv_sketch/intersect, triangle_count (oriented wedges), quality_route,
parquet footer+page decode, avro container scan, geohash density.
SCALE.md discipline: min-of-2 in one session; linear growth or bust."""
import io
import sys
import time

sys.path.insert(0, "/root/repo")

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


# --- KMV sketch + pairwise intersection ------------------------------------
from odin_rs_spark.operators.sketches import kmv_intersect, kmv_sketch  # noqa: E402


def kmv(scale):
    df = spark.range(100_000 * scale).select(
        (F.col("id") % 8).cast("string").alias("g"),
        (F.col("id") % (20_000 * scale)).alias("k"),
    )
    sk = kmv_sketch(df, "k", ["g"], k=128)
    kmv_intersect(sk, ["g"], "g", k=128).collect()


# --- triangle counting (oriented wedges) ------------------------------------
from odin_rs_spark.operators.graph import triangle_count  # noqa: E402


def tri(scale):
    n = 3_000 * scale
    # ring + chords: 4 edges per node, degree-bounded
    e = spark.range(n).select(F.col("id").alias("src"))
    edges = None
    for d in (1, 2, 3, 7):
        nxt = e.select("src", ((F.col("src") + d) % n).alias("dst"))
        edges = nxt if edges is None else edges.unionAll(nxt)
    triangle_count(edges).agg(F.sum("triangles")).collect()


# --- trained quality routing -------------------------------------------------
from odin_rs_spark.functions.quality import quality_route  # noqa: E402


def qual(scale):
    docs = spark.range(20_000 * scale).select(
        F.concat(
            F.lit("the quick brown fox number "),
            F.col("id").cast("string"),
            F.lit(" jumps over the lazy dog and runs to the river."),
        ).alias("text")
    )
    quality_route(docs).groupBy("bucket").count().collect()


# --- parquet footer + page decode -------------------------------------------
def _parquet_bytes(scale):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = list(range(60_000 * scale))
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "val": pa.array([i * 0.25 for i in ids], pa.float64()),
    })
    sink = io.BytesIO()
    pq.write_table(t, sink, row_group_size=10_000, compression="snappy",
                   use_dictionary=False)
    return sink.getvalue()


_PQ = {s: _parquet_bytes(s) for s in (1, 10)}


def pages(scale):
    from odin_rs_spark.sources.parquetmeta import parquet_page_audit

    df = spark.createDataFrame(
        [(f"s{scale}.parquet", _PQ[scale])], "path string, content binary"
    )
    parquet_page_audit(df, ["id", "val"]).collect()


# --- avro container scan ------------------------------------------------------
def _avro_bytes(scale):
    import json

    from odin_rs_spark.sources.avrocodec import encode_avro

    schema = json.dumps({
        "type": "record", "name": "E",
        "fields": [{"name": "id", "type": "long"},
                   {"name": "v", "type": ["null", "double"]}],
    })
    recs = [{"id": i, "v": None if i % 9 == 0 else i * 0.5}
            for i in range(40_000 * scale)]
    return encode_avro(schema, recs, codec="deflate", block_records=1000)


_AV = {s: _avro_bytes(s) for s in (1, 10)}


def avro(scale):
    from odin_rs_spark.sources.avrocodec import avro_records

    df = spark.createDataFrame(
        [(f"s{scale}.avro", _AV[scale])], "path string, content binary"
    )
    avro_records(df, {"id": "bigint", "v": "double"}).agg(
        F.sum("v")
    ).collect()


# --- geohash cell density ------------------------------------------------------
from odin_rs_spark.functions.geo import geohash_cells  # noqa: E402


def geo(scale):
    pts = spark.range(200_000 * scale).select(
        (20.0 + (F.col("id") % 900) * 0.05).alias("lat"),
        (-130.0 + (F.col("id") % 1200) * 0.05).alias("lon"),
    )
    gh, xc, yc = geohash_cells(F.col("lat"), F.col("lon"), 5)
    pts.select(gh.alias("g"), xc.alias("x"), yc.alias("y")).groupBy(
        "g", "x", "y"
    ).count().count()


run("kmv_sketch+intersect", kmv)
run("triangle_count", tri)
run("quality_route", qual)
run("parquet_page_audit", pages)
run("avro_scan", avro)
run("geohash_density", geo)
spark.stop()
