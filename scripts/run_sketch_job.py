"""spark-submit entrypoint for distributed sketch builds.

Usage (cluster):
    spark-submit --py-files hlld_spark.zip scripts/run_sketch_job.py \
        --input /data/web_pages --keys lang --col url \
        --sketch hll --precision 12 \
        --output /out/sketches --checkpoint-dir /ckpt --job-id nightly1

    (build hlld_spark.zip with: python -c "from hlld_spark.session import \
     ship_package" … or scripts/make_pyfiles_zip.py)

Usage (local smoke):
    python scripts/run_sketch_job.py --input ... --cpus 8

Resumable: pass --checkpoint-dir; a killed job re-submitted with the
same --job-id skips completed splits (per-split lineage manifests).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_spec(args):
    if args.sketch == "hll":
        from hlld_spark.core.accumulator import HllSpec

        return HllSpec(precision=args.precision) if args.eps is None else HllSpec.for_error(args.eps)
    if args.sketch == "cms":
        from hlld_spark.core.cms import CmsSpec

        return CmsSpec()
    if args.sketch == "bloom":
        from hlld_spark.core.bloom import BloomSpec

        return BloomSpec()
    if args.sketch == "tdigest":
        from hlld_spark.core.tdigest import TDigestSpec

        return TDigestSpec()
    if args.sketch == "kll":
        from hlld_spark.core.kll import KllSpec

        return KllSpec()
    raise SystemExit(f"unknown sketch {args.sketch}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir / glob (or Iceberg table name)")
    ap.add_argument("--keys", default="", help="comma-separated group keys (empty = global)")
    ap.add_argument("--col", required=True)
    ap.add_argument("--sketch", default="hll", choices=["hll", "cms", "bloom", "tdigest", "kll"])
    ap.add_argument("--precision", type=int, default=12)
    ap.add_argument("--eps", type=float, default=None)
    ap.add_argument("--output", default=None, help="sketch table output dir")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--job-id", default="job0")
    ap.add_argument("--cpus", type=int, default=None, help="local mode only")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None and args.cpus:
        from hlld_spark.session import get_spark

        spark = get_spark(app_name="hlld-sketch-job", cpus=args.cpus)
    else:
        spark = active or SparkSession.builder.appName("hlld-sketch-job").getOrCreate()
        from hlld_spark.session import ship_package

        ship_package(spark)

    keys = [k for k in args.keys.split(",") if k]
    spec = build_spec(args)
    t0 = time.time()
    if args.checkpoint_dir:
        from hlld_spark.checkpoint import checkpointed_build, lineage

        out = checkpointed_build(
            spark, args.input, keys, args.col, spec, ckpt_dir=args.checkpoint_dir, job_id=args.job_id
        )
        man = lineage(args.checkpoint_dir, args.job_id)
        rows_scanned = sum(m["rows"] for m in man)
    else:
        from hlld_spark.operators.sketch import build_sketches_parquet

        out = build_sketches_parquet(spark, args.input, keys, args.col, spec)
        rows_scanned = None

    from hlld_spark.operators.sketch import with_estimate

    result = with_estimate(out)
    if args.output:
        from hlld_spark.sources.tables import write_table

        fmt = write_table(result, args.output, partition_by=None)
    else:
        fmt = "stdout"
        for r in result.collect():
            print({k: r[k] for k in result.columns if k != "sketch"})
    elapsed = time.time() - t0
    summary = {
        "job_id": args.job_id,
        "sketch": args.sketch,
        "keys": keys,
        "elapsed_sec": round(elapsed, 3),
        "rows_scanned": rows_scanned,
        "output": args.output or "stdout",
        "format": fmt,
    }
    if rows_scanned:
        summary["docs_per_sec"] = round(rows_scanned / elapsed, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
