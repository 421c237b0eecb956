"""AQE skew-join rescue, measured (SCALE.md discipline): a fact table
where 60% of rows share ONE join key against a 1k-key dim, broadcast
disabled so the join must shuffle. Three runs: AQE skew-join ON, OFF,
and the manual salted_join operator. min-of-2 wall clock each, plus
the executed-plan marker showing whether AQE actually split the skewed
partition ('skew=true' in the SMJ node)."""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(skew_enabled: bool):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_enabled).lower())
        # the post-join aggregate imposes a distribution requirement;
        # without force, AQE declines to split (the real-world caveat
        # this probe exists to document)
        .config("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "256KB",
        )
        # the hot partition must exceed the advisory target or AQE has
        # nothing to split INTO (found live: with the default 64MB
        # advisory a few-MB hot partition never splits)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    n = 2_000_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 6, F.lit(0))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        # md5 pad: an incompressible payload — a constant pad compresses
        # to nothing and the BYTES-based skew detector never fires
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("w")
    )
    times = []
    for _ in range(2):
        t0 = time.time()
        out = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)), F.sum(F.col("v") * F.col("w"))
        )
        out.collect()
        times.append(time.time() - t0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    spark.stop()
    return min(times), ("skew=true" in plan)


for enabled in (False, True):
    t, split = run(enabled)
    print(f"AQE skewJoin {'ON ' if enabled else 'OFF'}: {t:.2f} s"
          f" (plan split skewed partition: {split})", flush=True)

# manual salting for comparison
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from odin_rs_spark.operators.skew import salted_join

n = 2_000_000
fact = spark.range(n).select(
    F.when(F.col("id") % 10 < 6, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
    (F.col("id") * 7 % 1000).alias("v"),
    F.repeat(F.lit("x"), 64).alias("pad"),
)
dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("w"))
times = []
for _ in range(2):
    t0 = time.time()
    salted_join(fact, dim, "k", salt_buckets=16).groupBy().agg(
        F.count(F.lit(1)), F.sum(F.col("v") * F.col("w"))
    ).collect()
    times.append(time.time() - t0)
print(f"manual salted_join (16 salts): {min(times):.2f} s", flush=True)
