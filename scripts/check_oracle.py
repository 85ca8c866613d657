"""Driver-compare harness: run every __spark_entry__ queries() entry on
Spark AND its oracle_sql() on DuckDB over the same sf dir; compare
row-count + column names + order-insensitive values (the driver's gate,
approximated). Usage: python scripts/check_oracle.py [sf_dir] [name...]"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from reiz_io_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(v, ".6f")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    # Benign-noise hygiene (VERDICT r06 nit): the first query that
    # materializes a not-yet-written side table makes Spark probe the
    # path and log a WARN FileStreamSink + FileNotFoundException stack
    # trace mid-sweep — it reads like a failure even when all entries
    # pass. Real failures surface as Python exceptions below.
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            # Spark 4.1 package (sinks.*; 3.x had it one level up)
            "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"{name:30s} SPARK-ERROR {e}")
            continue
        if name not in osql:
            print(f"{name:30s} rows-only: {len(srows):6d} rows "
                  f"({time.perf_counter()-t0:5.1f}s)")
            if len(srows) == 0 and name not in ("dedup_minhash_lsh",):
                failures.append((name, "rows-only entry returned 0 rows"))
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:30s} DUCKDB-ERROR {e}")
            continue
        dcols = list(ddf.columns)
        ok_cols = sorted(scols) == sorted(dcols)
        s_set = sorted(
            tuple(norm(r[c]) for c in sorted(scols)) for r in (row.asDict() for row in srows)
        )
        d_set = sorted(
            tuple(norm(v) for v in row) for row in ddf[sorted(dcols)].itertuples(index=False)
        )
        ok_rows = len(s_set) == len(d_set)
        ok_vals = s_set == d_set
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "MISMATCH"
        print(
            f"{name:30s} {status}  spark={len(s_set):5d} duck={len(d_set):5d} "
            f"cols={'=' if ok_cols else scols} ({time.perf_counter()-t0:5.1f}s)"
        )
        if status != "OK":
            failures.append((name, "mismatch"))
            if not ok_cols:
                print("   spark cols:", sorted(scols), "duck cols:", sorted(dcols))
            diff_s = [r for r in s_set if r not in set(d_set)][:3]
            diff_d = [r for r in d_set if r not in set(s_set)][:3]
            if diff_s:
                print("   spark-only:", diff_s)
            if diff_d:
                print("   duck-only: ", diff_d)
    print("\nFAILURES:", len(failures))
    for n, why in failures:
        print(" -", n, why)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
