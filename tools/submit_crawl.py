#!/usr/bin/env python
"""spark-submit entrypoint for the crawl engine.

North-rule deployment shape ("run via spark-submit --py-files on a
multi-executor cluster at two cluster sizes"):

    python tools/make_pyfiles.py                       # dist/xcrawl3r_spark.zip
    spark-submit --master <cluster-url> \\
        --py-files dist/xcrawl3r_spark.zip \\
        tools/submit_crawl.py \\
        --hosts 400 --pages-per-host 1000 --depth 0 \\
        --checkpoint-dir /tmp/crawl_ckpt --out /tmp/crawl_out

The script builds NO SparkSession config of its own beyond app defaults —
master / executor counts / memory come from spark-submit, so the same
invocation runs at N and 4N executors unchanged (the sandbox stand-in is
``--master local[N]``, pinned via taskset by bench.py --scaling). Seeds
and the fetchable web graph are generated deterministically (seed=42,
FIXTURES.md) since the sandbox has no live HTTP; on a real deployment
replace ``pages_df`` with the HTTP fetch stage and ``seeds`` with
``spark.read.text(<seed list>)``.

Prints one JSON line of crawl metrics; writes edges/seen/images/errors
parquet under --out if given.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=50)
    ap.add_argument("--pages-per-host", type=int, default=100)
    ap.add_argument("--fanout", type=int, default=4)
    ap.add_argument("--n-seeds", type=int, default=4)
    ap.add_argument("--depth", type=int, default=0, help="0 = unbounded")
    ap.add_argument("--parallelism", type=int, default=0,
                    help="per-host politeness budget per iteration; 0 = off")
    ap.add_argument("--global-dedup", action="store_true", default=True)
    ap.add_argument("--per-seed-dedup", dest="global_dedup",
                    action="store_false",
                    help="reference-faithful per-seed seen sets")
    ap.add_argument("--max-iterations", type=int, default=100)
    ap.add_argument("--ingest-payloads", action="store_true",
                    help="join discovered image URLs to the (synthetic) "
                         "payload table and decode+verify in the loop")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the last committed iteration")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("xcrawl3r_spark_crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from xcrawl3r_spark.config import CrawlConfig
    from xcrawl3r_spark.plans.crawl import Crawler
    from xcrawl3r_spark.sources import datagen as G

    p = G.GraphParams(hosts=args.hosts, pages_per_host=args.pages_per_host,
                      fanout=args.fanout)
    cfg = CrawlConfig(
        domains=["test"], include_subdomains=True, depth=args.depth,
        parallelism=args.parallelism, global_dedup=args.global_dedup,
        checkpoint_dir=args.checkpoint_dir,
    )
    seeds = G.seeds_df(spark, p, n_seeds=args.n_seeds)
    pages = G.pages_df(spark, p).persist()
    pages.count()
    payloads = G.images_df(spark, p) if args.ingest_payloads else None

    crawler = Crawler(spark, cfg)
    t0 = time.perf_counter()
    if args.resume:
        res = crawler.resume(seeds, pages, image_payloads=payloads)
    else:
        res = crawler.crawl(seeds, pages, image_payloads=payloads,
                            max_iterations=args.max_iterations)
    n_seen = res.seen.count()
    dt = time.perf_counter() - t0

    if args.out:
        res.edges.write.mode("overwrite").parquet(f"{args.out}/edges")
        res.seen.write.mode("overwrite").parquet(f"{args.out}/seen")
        res.images.write.mode("overwrite").parquet(f"{args.out}/images")
        res.errors.write.mode("overwrite").parquet(f"{args.out}/errors")

    print(json.dumps({
        "urls_seen": n_seen,
        "iterations": res.iterations,
        "seconds": round(dt, 3),
        "urls_per_sec": round(n_seen / dt, 1) if dt else None,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "per_iteration": res.metrics,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
