"""Driver-contract replica: run every queries() entry against its
oracle_sql() in DuckDB at the given sf dir (default sf0.01)."""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession  # noqa: E402

from oracle import compare, dtype_mismatches, duckdb_con  # noqa: E402


def main(sf_dir="/root/testdata/sf0.01"):
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    assert len(E.entry(spark).collect()) > 0
    con = duckdb_con(sf_dir)
    qs, osql = E.queries(), E.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if name in osql:
            df = fn(spark, sf_dir)
            ok, msg = compare(df, con, osql[name])
            # the driver's hash is dtype-sensitive even when values
            # match (both round-2 failures were exactly this class)
            bad = dtype_mismatches(df, con, osql[name])
            if not ok or bad:
                fails += 1
                print("FAIL", name, msg, bad or "", flush=True)
        else:
            print("RAN ", name, fn(spark, sf_dir).count(), "rows", flush=True)
    print("DONE fails=", fails, "of", len(qs), flush=True)
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(*sys.argv[1:]) else 0)
