"""Round-9 wave-4 10x scale probes (the r6+ discipline: every new
walker/operator family gets a 10x fixture-count measurement so a
hidden quadratic shows up as >>10x wall time — this is how the
SemDeDup pair blowup was caught). min-of-2 per scale; first run
carries one-time codegen."""
import sys
import time

sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from odin_rs_spark.deploy import ensure_shipped  # noqa: E402

ensure_shipped(spark)


def tiff_media(n):
    def _mk(series):
        import numpy as np

        from odin_rs_spark.sources.imagecodec import encode_tiff

        out = []
        for mid in series:
            mid = int(mid)
            seed = mid % 25
            ys, xs = np.mgrid[0:18, 0:25]
            vals = ((seed * 41 + xs * (seed % 6 + 1) + ys * (seed % 5)) % 256).astype(
                np.uint8
            )
            out.append(
                encode_tiff(
                    vals,
                    packbits=mid % 3 == 0,
                    big_endian=mid % 2 == 0,
                    rows_per_strip=5 if mid % 4 == 0 else None,
                )
            )
        return pd.Series(out)

    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n).select(
        F.col("id").alias("media_id"), mk(F.col("id")).alias("content")
    )


def warc_media(n_files):
    def _mk(series):
        from odin_rs_spark.sources.warc import encode_warc

        out = []
        for fno in series:
            fno = int(fno)
            recs = []
            for j in range(24):
                body = (b"<!DOCTYPE html><p>page %d</p>" % j) if j % 2 == 0 else (
                    b"\x89PNG\r\n\x1a\n" + b"p%d" % j
                )
                hdrs = (
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    "Content-Length: %d\r\n\r\n" % len(body)
                )
                recs.append({
                    "warc_type": "response",
                    "target_uri": f"https://p.example.org/{fno}/{j}",
                    "content_type": "application/http; msgtype=response",
                    "block": hdrs.encode() + body,
                })
            out.append(encode_warc(recs))
        return pd.Series(out)

    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n_files).select(
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        mk(F.col("id")).alias("content"),
    )


def line_docs(n):
    d, j = F.col("id"), F.col("j")
    line = F.concat(F.lit("segment "), ((d + j * j) % 7).cast("string"))
    return (
        spark.range(n)
        .select("id", F.explode(F.sequence(F.lit(0), 4 + (d % 8))).alias("j"))
        .select("id", line.alias("line"))
        .groupBy("id")
        .agg(F.array_join(F.collect_list("line"), "\n").alias("text"))
        .select(F.col("id").alias("doc_id"), "text")
    )


def hosts(n):
    return spark.range(n).select(
        F.concat(
            F.lit("sub"), (F.col("id") % 9).cast("string"), F.lit(".site"),
            (F.col("id") % 50).cast("string"), F.lit(".com"),
        ).alias("host")
    )


def run(name, fn):
    for scale in (1, 10):
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(scale)
            times.append(time.time() - t0)
        print(f"{name} x{scale}: {min(times):.2f} s", flush=True)


from odin_rs_spark.operators.multimodal import image_tile_stats  # noqa: E402
from odin_rs_spark.operators.skew import rendezvous_assign  # noqa: E402
from odin_rs_spark.operators.text import (  # noqa: E402
    c4_line_filter,
    line_repetition_signals,
)
from odin_rs_spark.operators.web import blocklist_match  # noqa: E402
from odin_rs_spark.sources.warc import warc_records  # noqa: E402

BL = spark.createDataFrame(
    [(f"site{k}.com", "cat") for k in range(0, 50, 7)], ["suffix", "category"]
)

run("tiff_decode 48->480", lambda s: image_tile_stats(
    tiff_media(48 * s), nx=5, ny=3
).agg(F.count(F.lit(1)), F.sum("n_px")).collect())
run("warc_sniff 4->40 files", lambda s: warc_records(warc_media(4 * s)).groupBy(
    "sniffed_mime"
).count().collect())
run("line_repetition 200->2000", lambda s: line_repetition_signals(
    line_docs(200 * s)
).agg(F.count(F.lit(1)), F.sum("n_lines")).collect())
run("c4_line_filter 200->2000", lambda s: c4_line_filter(
    line_docs(200 * s)
).agg(F.count(F.lit(1)), F.sum("n_kept_lines")).collect())
run("blocklist_match 2k->20k hosts", lambda s: blocklist_match(
    hosts(2000 * s), BL
).groupBy("block_category").count().collect())
run("rendezvous 2k->20k keys", lambda s: rendezvous_assign(
    hosts(2000 * s), "host", [f"n{k}" for k in range(8)]
).groupBy("node").count().collect())
