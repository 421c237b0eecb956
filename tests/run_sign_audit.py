"""Signed-zero audit (round-8 verdict #1): run EVERY queries() entry
against its oracle with a sign-SENSITIVE float normalizer — the local
replica's `_norm_cell` collapses -0.0 to +0.0 (matching the driver fix
we made), but the DRIVER's textual hash distinguishes them, so any
query where one side emits -0.0 and the other +0.0 is a latent driver
red. This audit flags exactly that class: it re-compares with
`math.copysign` visible in the normalized repr and reports queries
whose sign-sensitive compare fails.
"""
import math
import sys
from typing import Any

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import SparkSession  # noqa: E402

import oracle  # noqa: E402


def _sign_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 9)
        if r == 0.0:
            return "+0" if math.copysign(1.0, r) > 0 else "-0"
        return r
    if isinstance(v, list):
        return tuple(_sign_cell(x) for x in v)
    return v


def main(sf_dir="/root/testdata/sf0.01"):
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = oracle.duckdb_con(sf_dir)
    qs, osql = E.queries(), E.oracle_sql()
    flagged = 0
    for name, fn in qs.items():
        if name not in osql:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            flagged += 1
            print("ERR ", name, repr(exc)[:200], flush=True)
            continue

        def norm(cols, rows):
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            out = [tuple(_sign_cell(r[i]) for i in order) for r in rows]
            return sorted(out, key=repr)

        a, b = norm(scols, srows), norm(ocols, orows)
        if a != b:
            # distinguish "sign-only" from any other residual diff
            diffs = [
                (x, y) for x, y in zip(a, b) if x != y
            ][:3]
            flagged += 1
            print("SIGN-FAIL", name, diffs, flush=True)
    print("DONE sign-flagged=", flagged, "of", len(osql), flush=True)
    return flagged


if __name__ == "__main__":
    sys.exit(1 if main(*sys.argv[1:]) else 0)
