"""Single-node analog of the reference's bench.c: 1M `set`-equivalent
key adds into one named set, timed per phase (create / bulk), plus the
protocol-parsing path for context.

Reference numbers (/root/reference/README.md:306-312, bench.c): ≥1M
pipelined set ops/sec on a 2012 MBP, 1 thread. Our bulk path does the
same semantic work (hash each key, register scatter-max) vectorized.

Run: python3 scripts/registry_bench.py [--keys 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hlld_spark.protocol import CommandHandler
from hlld_spark.registry import SketchRegistry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=65536)
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="regbench")
    reg = SketchRegistry(root)

    t0 = time.time()
    reg.create("bench", precision=12)
    create_sec = time.time() - t0

    keys = [f"test{i}" for i in range(args.keys)]
    gen_sec = 0.0  # key materialization excluded, as in bench.c

    t0 = time.time()
    for i in range(0, len(keys), args.batch):
        reg.bulk("bench", keys[i : i + args.batch])
    bulk_sec = time.time() - t0

    # protocol-parsing path (one command line per 32-key bulk, like the
    # reference's MULTI_OP_SIZE pipelining)
    h = CommandHandler(reg)
    t0 = time.time()
    n_proto = 100_000
    for i in range(0, n_proto, 32):
        h.handle_command("bulk bench " + " ".join(keys[i : i + 32]) + "\n")
    proto_sec = time.time() - t0

    est = reg.info("bench")["size"]
    print(
        json.dumps(
            {
                "keys": args.keys,
                "create_sec": round(create_sec, 4),
                "bulk_ops_per_sec": round(args.keys / bulk_sec, 1),
                "protocol_ops_per_sec": round(n_proto / proto_sec, 1),
                "estimate": round(est, 1),
                "rel_err": round(abs(est - args.keys) / args.keys, 5),
                "reference_baseline_ops_per_sec": 1_000_000,
            }
        )
    )


if __name__ == "__main__":
    main()
