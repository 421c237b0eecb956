"""Round-9 wave-7 10x fixture-count probes: the eml_messages walker
and the wikitext/bitext column pipelines (SCALE.md discipline:
min-of-2 in one session; linear growth or bust)."""
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


def eml_media(n):
    def _mk(series):
        from odin_rs_spark.sources.mail import encode_eml
        out = []
        for mid in series:
            mid = int(mid)
            words = " ".join(f"mb{(mid*11+t)%23}" for t in range(4 + mid % 4))
            date = f"{1+mid%28} Mar 2024 {mid%24:02d}:{(mid*7)%60:02d}:00 +0{mid%3}00"
            if mid % 3 == 0:
                raw = encode_eml(f"S{mid%13}", f"u{mid%9}@d{mid%5}.ex", date,
                                 [("text/plain", "us-ascii", words)])
            else:
                raw = encode_eml(f"Ré {mid%13}", f"u{mid%9}@d{mid%5}.ex", date,
                                 [("text/plain", "utf-8", f"café {words}"),
                                  ("text/html", "cp1252", f"<p>déjà {words}</p>")],
                                 subject_encoding="B" if mid % 3 == 1 else "Q",
                                 nested=mid % 3 == 2)
            out.append(raw)
        return pd.Series(out)
    mk = F.pandas_udf(_mk, BinaryType())
    return spark.range(n).select(F.col("id").cast("string").alias("path"),
                                 mk(F.col("id")).alias("content"))


def run(name, fn):
    for scale in (1, 10):
        times = []
        for _ in range(2):
            t0 = time.time()
            fn(scale)
            times.append(time.time() - t0)
        print(f"{name} x{scale}: {min(times):.2f} s", flush=True)


from odin_rs_spark.sources.mail import eml_messages
from odin_rs_spark.operators.text import wikitext_to_text

run("eml_messages 60->600",
    lambda s: eml_messages(eml_media(60 * s)).agg(
        F.count(F.lit(1)), F.sum("n_chars")).collect())

docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

run("wikitext 500->5000",
    lambda s: (docs if s == 1
               else spark.read.parquet("/root/testdata/sf0.1/documents.parquet"))
    .select(wikitext_to_text(F.col("text")).alias("t"))
    .agg(F.sum(F.length("t"))).collect())
