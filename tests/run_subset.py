"""Subset verify: run only the named queries() entries against their
oracle_sql() at the given sf dir — the fast inner loop while iterating
on one operator family (run_verify.py remains the full gate).

Usage: python tests/run_subset.py q162_html_extract q167_main_text ...
       [--sf /root/testdata/sf0.01]
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession  # noqa: E402

from oracle import compare, dtype_mismatches, duckdb_con  # noqa: E402


def main(names, sf_dir="/root/testdata/sf0.01"):
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)
    qs, osql = E.queries(), E.oracle_sql()
    fails = 0
    for name in names:
        fn = qs[name]
        if name in osql:
            df = fn(spark, sf_dir)
            ok, msg = compare(df, con, osql[name])
            bad = dtype_mismatches(df, con, osql[name])
            if not ok or bad:
                fails += 1
                print("FAIL", name, msg, bad or "", flush=True)
            else:
                print("PASS", name, flush=True)
        else:
            print("RAN ", name, fn(spark, sf_dir).count(), "rows", flush=True)
    print("DONE fails=", fails, "of", len(names), flush=True)
    return fails


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sys.exit(1 if main(args, sf) else 0)
