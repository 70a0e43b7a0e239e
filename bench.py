#!/usr/bin/env python
"""Benchmark harness — run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the flagship crawl (full BFS-to-exhaustion of a deterministic
synthetic web graph with a global URL-seen set — URLs fetched+deduped/sec is
the BASELINE.json target metric) + the heaviest operator analogs +
training-data ops on the sf tables. ``value`` = total wall seconds.

Scaling evidence (BASELINE north rule, N -> 4N executors stood in by
local[8] vs local[32]): ``python bench.py --scaling`` runs the SAME
frontier-replay job (one full engine iteration over a ~1.3M-row frontier:
within-batch dedup -> Bloom+anti-join vs seen -> fetch join -> Arrow
extraction -> next-frontier build) at both parallelism levels on the same
input and reports URLs/sec at each plus efficiency = (T_8 / T_32) / 4,
writing BENCH/BASELINE.md. The replay frames the crawl the way the metric
does ("seed-list replay"): throughput of the per-iteration pipeline, with
fixed per-iteration driver overhead amortized over one big batch exactly as
it would be over a 10^10-URL frontier.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# e2e crawl graph: ~160k fetchable URLs, BFS to exhaustion
CRAWL_HOSTS = int(os.environ.get("BENCH_CRAWL_HOSTS", "200"))
CRAWL_PAGES = int(os.environ.get("BENCH_CRAWL_PAGES", "500"))
CRAWL_DEPTH = int(os.environ.get("BENCH_CRAWL_DEPTH", "0"))  # 0 = unbounded
CRAWL_MAX_ITERS = int(os.environ.get("BENCH_CRAWL_MAX_ITERS", "30"))

# scaling replay graph: ~4.7M URLs / ~9.5M frontier rows, one engine
# iteration. Sized so parallel pipeline work (~10 min of core-seconds)
# dominates the fixed per-iteration driver overhead — the regime a
# 10^10-URL frontier is always in.
REPLAY_HOSTS = int(os.environ.get("BENCH_REPLAY_HOSTS", "1200"))
REPLAY_PAGES = int(os.environ.get("BENCH_REPLAY_PAGES", "2400"))
REPLAY_FANOUT = int(os.environ.get("BENCH_REPLAY_FANOUT", "16"))

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
        extra_conf={
            # replay caches ~5M page bodies + checkpoints ~50M frontier
            # rows; size the (local-mode) heap so neither level spills
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g"),
        },
    )


def _crawl_cfg(**kw):
    from xcrawl3r_spark.config import CrawlConfig

    base = dict(
        domains=["test"], include_subdomains=True, depth=CRAWL_DEPTH,
        parallelism=0, bloom_enabled=True, global_dedup=True,
    )
    base.update(kw)
    return CrawlConfig(**base)


def run_crawl(spark, params=None, cfg=None):
    """Full BFS crawl of the synthetic graph; returns (urls_seen, seconds)."""
    from xcrawl3r_spark.plans.crawl import Crawler
    from xcrawl3r_spark.sources import datagen as G

    p = params or G.GraphParams(hosts=CRAWL_HOSTS, pages_per_host=CRAWL_PAGES)
    cfg = cfg or _crawl_cfg()
    seeds = G.seeds_df(spark, p, n_seeds=4)
    pages = G.pages_df(spark, p).persist()
    pages.count()  # materialize the graph outside the timed section
    t0 = time.perf_counter()
    res = Crawler(spark, cfg).crawl(seeds, pages, max_iterations=CRAWL_MAX_ITERS)
    n_seen = res.seen.count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return n_seen, dt


def _one_replay(spark, p):
    from pyspark.sql import functions as F

    from xcrawl3r_spark.plans.crawl import Crawler
    from xcrawl3r_spark.sources import datagen as G

    pages = G.pages_df(spark, p).persist()
    pages.count()
    c = Crawler(spark, _crawl_cfg(depth=0))
    urls = pages.select("url").withColumn("seed_id", F.lit("r"))
    frontier = (
        urls.unionByName(urls)  # 2x duplication exercises within-batch dedup
        .withColumn("depth", F.lit(1))
    )
    frontier = c._with_keys(frontier).select(
        "seed_id", "url", "url_hash", "dedup_key", "host", "depth"
    ).localCheckpoint(eager=True)
    n_frontier = frontier.count()
    seeds = spark.createDataFrame([], "seed_id string, url string")
    t0 = time.perf_counter()
    res = c.crawl(seeds, pages, initial_frontier=frontier, max_iterations=1)
    n_seen = res.seen.count()
    dt = time.perf_counter() - t0
    pages.unpersist()
    return n_frontier, n_seen, dt


def run_replay(spark):
    """One engine iteration over a 2x-duplicated full-graph frontier:
    the per-iteration pipeline (dedup -> seen anti-join -> fetch ->
    extraction -> next-frontier build) as a single big batch.

    A small warm-up replay runs first (untimed): it JITs the codegen'd
    stages and spins up the Python worker pool, mirroring the steady state
    of a long-running cluster — on real N vs 4N fleets the per-executor
    warm-up is constant, so letting it pollute the timed section would
    bias against the larger configuration.

    Returns (frontier_rows, urls_seen, seconds)."""
    from xcrawl3r_spark.sources import datagen as G

    _one_replay(spark, G.GraphParams(hosts=16, pages_per_host=40,
                                     fanout=REPLAY_FANOUT))
    return _one_replay(
        spark,
        G.GraphParams(hosts=REPLAY_HOSTS, pages_per_host=REPLAY_PAGES,
                      fanout=REPLAY_FANOUT),
    )


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
            nf, n, dt = run_replay(s)
            scale_res[cpus] = {
                "frontier_rows": nf, "urls": n, "sec": round(dt, 3),
                "urls_per_sec": round(n / dt, 1),
            }
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

**Scaling job** (the sandbox stand-in for N vs 4N executors per
BASELINE.json north_rule): the engine's per-iteration pipeline run as one
frontier replay — a 2x-duplicated frontier of every URL of a deterministic
synthetic web graph (hosts={REPLAY_HOSTS}, pages/host={REPLAY_PAGES},
seed=42) pushed through within-batch dedup -> Bloom + anti-join vs the
URL-seen set -> politeness -> fetch join -> Arrow-batched link extraction
-> next-frontier build. Same input, same plan, local[8] vs local[32].

| config | frontier rows | URLs seen | seconds | URLs/sec |
|---|---|---|---|---|
| local[8]  (N)  | {s['local8']['frontier_rows']} | {s['local8']['urls']} | {s['local8']['sec']} | {s['local8']['urls_per_sec']} |
| local[32] (4N) | {s['local32']['frontier_rows']} | {s['local32']['urls']} | {s['local32']['sec']} | {s['local32']['urls_per_sec']} |

**speedup 8->32 = {s['speedup']}x, scaling efficiency = speedup/4 =
{s['efficiency']}** (target >= 0.8 per BASELINE.json).

**End-to-end BFS crawl** (depth-unbounded, global URL-seen set,
hosts={CRAWL_HOSTS}, pages/host={CRAWL_PAGES}): {result['crawl_urls_seen']}
URLs fetched+deduped in {result['queries']['crawl_e2e']} s =
{result['crawl_urls_per_sec']} URLs/sec at local[{CPUS}].

Headline query timings at {result['sf']} (local[{CPUS}]): total
{result['value']} s.

```json
{json.dumps(result, indent=1)}
```
""")


if __name__ == "__main__":
    main()
