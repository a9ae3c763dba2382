"""Local twin of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare rows/schema/
values (order-insensitive, column-name-sorted) and print a verdict line
per query."""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from hlld_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cols_sorted = [cols[i] for i in order]
    normed = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return cols_sorted, normed


def main():
    spark = get_spark(app_name="oracle-check", cpus=int(os.environ.get("CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # optional substring filters: `python scripts/check_oracle.py lang decon`
    # runs only queries whose name contains any argument
    if len(sys.argv) > 1:
        pats = sys.argv[1:]
        qs = {k: v for k, v in qs.items() if any(p in k for p in pats)}
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:32s} ROWS-ONLY  rows={len(srows)}")
            continue
        res = con.sql(oracles[name])
        ocols = res.columns
        orows = res.fetchall()
        sc, sv = frame_fingerprint(scols, srows)
        oc, ov = frame_fingerprint(ocols, orows)
        if sc != oc:
            print(f"{name:32s} SCHEMA MISMATCH spark={sc} oracle={oc}")
            failures += 1
        elif len(sv) != len(ov):
            print(f"{name:32s} ROWCOUNT MISMATCH spark={len(sv)} oracle={len(ov)}")
            failures += 1
        elif sv != ov:
            bad = sum(1 for a, b in zip(sv, ov) if a != b)
            print(f"{name:32s} VALUE MISMATCH ({bad}/{len(sv)} rows differ)")
            for a, b in list(zip(sv, ov))[:200]:
                if a != b:
                    print("   spark :", a)
                    print("   oracle:", b)
                    break
            failures += 1
        else:
            print(f"{name:32s} OK  rows={len(sv)}")
    # entry smoke
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"{'entry(spark)':32s} OK  rows={n} schema={edf.columns}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
