"""Round-9 10x fixture-count probes: pdf_pages / docx_paragraphs /
exif_stats walkers (VERDICT r8 #7). min-of-2 in one session (the
SCALE.md discipline: first run carries one-time codegen)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType
import pandas as pd

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from odin_rs_spark.deploy import ensure_shipped
ensure_shipped(spark)


def pdf_media(n):
    def _mk(series):
        from odin_rs_spark.sources.pdfcodec import encode_pdf
        out = []
        for mid in series:
            mid = int(mid)
            pages = [[" ".join(f"pw{(mid*7+p*3+j*5+w)%19}" for w in range(6+(mid+p+j)%4))
                      for j in range(1+(mid+p)%3)] for p in range(1+mid%3)]
            out.append(encode_pdf(pages, compress=mid % 2 == 0))
        return pd.Series(out)
    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n).select(F.col("id").cast("string").alias("path"),
                                 mk(F.col("id")).alias("content"))


def docx_media(n):
    def _mk(series):
        from odin_rs_spark.sources.officedoc import encode_docx
        out = []
        for mid in series:
            mid = int(mid)
            paras = [" ".join(f"dw{(mid*13+p*7+w)%23}" for w in range(5+(mid+p)%5))
                     for p in range(1+mid%4)]
            out.append(encode_docx(paras, compress=mid % 2 == 0))
        return pd.Series(out)
    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n).select(F.col("id").cast("string").alias("path"),
                                 mk(F.col("id")).alias("content"))


def exif_media(n):
    def _mk(series):
        import numpy as np
        from odin_rs_spark.sources.exif import encode_exif_app1, insert_app1
        from odin_rs_spark.sources.jpegcodec import encode_jpeg
        out = []
        for mid in series:
            mid = int(mid)
            img = np.full((16, 16), 100 + 2 * (mid % 60), np.uint8)
            gps = ((mid % 80) + 0.5, -((mid % 170) + 0.25)) if mid % 3 == 0 else None
            app1 = encode_exif_app1(make=f"Cam{mid%5}", model=f"M{mid%4}",
                                    orientation=1 + mid % 8, gps=gps,
                                    byte_order="<" if mid % 2 == 0 else ">")
            out.append(insert_app1(encode_jpeg(img), app1))
        return pd.Series(out)
    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n).select(F.col("id").alias("media_id"),
                                 mk(F.col("id")).alias("content"))


def run(name, fn):
    for n, label in ((None, None),):
        pass
    for scale in (1, 10):
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(scale)
            times.append(time.time() - t0)
        print(f"{name} x{scale}: {min(times):.2f} s", flush=True)


from odin_rs_spark.sources.pdfcodec import pdf_pages
from odin_rs_spark.sources.officedoc import docx_paragraphs
from odin_rs_spark.operators.multimodal import exif_stats

run("pdf_pages 40->400", lambda s: pdf_pages(pdf_media(40 * s)).agg(F.count(F.lit(1)), F.sum("n_chars")).collect())
run("docx_paragraphs 40->400", lambda s: docx_paragraphs(docx_media(40 * s)).agg(F.count(F.lit(1)), F.sum("n_chars")).collect())
run("exif_stats 60->600", lambda s: exif_stats(exif_media(60 * s)).agg(F.count(F.lit(1)), F.sum("orientation")).collect())
