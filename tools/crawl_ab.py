#!/usr/bin/env python
"""One-shot crawl timing for same-window A/B runs (guide §1): runs the
bench.py headline crawl (same graph, same cfg, same min-of-reps
methodology) in THIS checkout and prints one JSON line. Not a driver
artifact — bench.py stays the scoreboard."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    spark = bench._mk_spark(bench.CPUS, "crawl_ab")
    n, secs = bench.run_crawl(spark)
    print(json.dumps({
        "checkout": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "urls_seen": n, "sec": round(secs, 3),
        "urls_per_sec": round(n / secs, 1),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
