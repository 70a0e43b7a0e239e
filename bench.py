#!/usr/bin/env python
"""Benchmark harness — run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship crawl (the engine's whole per-iteration pipeline
on a deterministic synthetic web graph) + the heaviest operator analogs +
training-data ops on the sf tables. ``value`` = total wall seconds.

Scaling evidence (BASELINE north rule, N -> 4N executors stood in by
local[8] vs local[32]): ``python bench.py --scaling`` runs the same crawl
at both parallelism levels on the same input and reports URLs/sec at each
plus efficiency = (T_8 / T_32) / 4, and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# crawl bench graph: ~1e5 URLs at sf0.1-equivalent scale
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "60"))
CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "400"))
CRAWL_DEPTH = int(os.environ.get("BENCH_CRAWL_DEPTH", "3"))

HEADLINE = [
    "d1_anti_join",
    "a1_politeness_topk",
    "a6_metrics_agg",
    "e1_regex_extract",
    "j1_broadcast_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_quality",
    "text_langid",
    "sim_cosine_topk",
    "sim_near_dup",
]


def _mk_spark(cpus: str, app: str):
    from xcrawl3r_spark.session import get_spark

    return get_spark(
        app=app,
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
    )


def run_crawl(spark, params=None, cfg=None):
    """Full crawl of the synthetic graph; returns (urls_seen, seconds)."""
    from xcrawl3r_spark.config import CrawlConfig
    from xcrawl3r_spark.plans.crawl import Crawler
    from xcrawl3r_spark.sources import datagen as G

    p = params or G.GraphParams(hosts=CRAWL_HOSTS, pages_per_host=CRAWL_PAGES)
    cfg = cfg or CrawlConfig(
        domains=["test"], include_subdomains=True, depth=CRAWL_DEPTH,
        parallelism=0, bloom_enabled=True,
    )
    seeds = G.seeds_df(spark, p, n_seeds=4)
    pages = G.pages_df(spark, p).persist()
    pages.count()  # materialize the graph outside the timed section
    t0 = time.perf_counter()
    res = Crawler(spark, cfg).crawl(seeds, pages)
    n_seen = res.seen.count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return n_seen, dt


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv

    spark = _mk_spark(CPUS, "bench")
    timings = bench_queries(spark, SF_DIR)
    n_urls, crawl_sec = run_crawl(spark)
    timings["crawl_e2e"] = round(crawl_sec, 3)
    urls_per_sec = round(n_urls / crawl_sec, 1)

    result = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "crawl_urls_seen": n_urls,
        "crawl_urls_per_sec": urls_per_sec,
    }

    if scaling:
        spark.stop()
        scale_res = {}
        for cpus in ("8", "32"):
            s = _mk_spark(cpus, f"bench_scale_{cpus}")
            n, dt = run_crawl(s)
            scale_res[cpus] = {"urls": n, "sec": round(dt, 3),
                               "urls_per_sec": round(n / dt, 1)}
            s.stop()
        eff = (scale_res["8"]["sec"] / scale_res["32"]["sec"]) / 4.0
        result["scaling"] = {
            "local8": scale_res["8"],
            "local32": scale_res["32"],
            "speedup": round(scale_res["8"]["sec"] / scale_res["32"]["sec"], 3),
            "efficiency": round(eff, 3),
        }
        _write_baseline_md(result)

    print(json.dumps(result))


def _write_baseline_md(result: dict) -> None:
    s = result["scaling"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured scaling evidence

Same crawl job (deterministic synthetic web graph, hosts={CRAWL_HOSTS},
pages/host={CRAWL_PAGES}, depth={CRAWL_DEPTH}, seed=42) at two parallelism
levels on the same input — the sandbox stand-in for N vs 4N executors per
BASELINE.json north_rule.

| config | URLs seen | seconds | URLs/sec |
|---|---|---|---|
| local[8]  (N)  | {s['local8']['urls']} | {s['local8']['sec']} | {s['local8']['urls_per_sec']} |
| local[32] (4N) | {s['local32']['urls']} | {s['local32']['sec']} | {s['local32']['urls_per_sec']} |

**speedup 8->32 = {s['speedup']}x, scaling efficiency = speedup/4 =
{s['efficiency']}** (target >= 0.8 per BASELINE.json).

Headline query timings at {result['sf']} (local[{CPUS}]): total
{result['value']} s; crawl throughput {result['crawl_urls_per_sec']}
URLs/sec over {result['crawl_urls_seen']} URLs.

```json
{json.dumps(result, indent=1)}
```
""")


if __name__ == "__main__":
    main()
