"""CLI entry point — the reference's flag surface on the Spark engine.

Mirrors ``cmd/xcrawl3r/main.go:48-65`` flag-for-flag so a user of the
reference can run the same command line against this engine:

    python -m xcrawl3r_spark -u https://example.com -d example.com \
        --depth 2 --jsonl -o out.json

or, on a cluster (the north-rule submission path):

    spark-submit --py-files xcrawl3r_spark_pkg.zip -m xcrawl3r_spark ...

Seed precedence matches the reference (main.go:166-199): ``-u`` URLs,
plus ``-l`` list file, plus piped stdin when present. Config precedence
matches viper's YAML + env + flags, later wins (CrawlConfig.from_yaml;
flags only override when explicitly set). Output matches the reference's
stream semantics: every in-scope discovered URL per occurrence (the D3
emit multiset) on stdout, with ``-o`` writing the TXT/JSONL sink
(extension forced like internal/output/file.go:32-41).

The CLI defaults to the REAL fetch stage (fetch_mode="http"); pass
``--pages <parquet>`` to crawl a fetched-pages table instead (the
deterministic test double — also what the sandbox test uses).
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="xcrawl3r_spark",
        description="PySpark-native recursive web spider "
                    "(xcrawl3r-compatible flag surface)")
    # reference flags (cmd/xcrawl3r/main.go:48-65); defaults None so only
    # explicitly-set flags override YAML/env
    p.add_argument("-c", "--configuration", default=None,
                   help="YAML configuration file")
    p.add_argument("-u", "--url", action="append", default=[],
                   help="target URL (repeatable)")
    p.add_argument("-l", "--list", dest="list_file", default=None,
                   help="file of target URLs, one per line")
    p.add_argument("-d", "--domain", action="append", default=[],
                   help="scope domain (repeatable)")
    p.add_argument("--include-subdomains", action="store_true", default=None)
    p.add_argument("--delay", type=int, default=None)
    p.add_argument("-H", "--header", action="append", default=[],
                   help='"Name: value" request header (repeatable)')
    p.add_argument("--timeout", type=int, default=None)
    p.add_argument("-p", "--proxy", action="append", default=[],
                   help="proxy URL (repeatable, round-robin)")
    p.add_argument("--depth", type=int, default=None,
                   help="max BFS depth; 0 = unbounded")
    p.add_argument("-C", "--concurrency", type=int, default=None)
    p.add_argument("-P", "--parallelism", type=int, default=None)
    p.add_argument("--debug", action="store_true", default=None)
    p.add_argument("--jsonl", action="store_true",
                   help="output in JSONL(ines)")
    p.add_argument("-o", "--output", default=None,
                   help="output file (TXT, or JSONL with --jsonl)")
    p.add_argument("-m", "--monochrome", action="store_true")
    p.add_argument("--silent", action="store_true",
                   help="URLs only on stdout, no summary")
    p.add_argument("-v", "--verbose", action="store_true")
    # engine knobs (beyond the reference: Spark submission + test double)
    p.add_argument("--master", default=None,
                   help="Spark master (default: env/local)")
    p.add_argument("--pages", default=None,
                   help="parquet of (url, content_type, body, status): "
                        "crawl this fetched-pages table instead of the "
                        "network (fetch_mode=table)")
    p.add_argument("--checkpoint-dir", default=None,
                   help="snapshot dir; with --resume continues the last "
                        "committed iteration")
    p.add_argument("--resume", action="store_true")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    from xcrawl3r_spark.config import CrawlConfig
    from xcrawl3r_spark.plans.crawl import Crawler
    from xcrawl3r_spark.sinks import files as sinks
    from xcrawl3r_spark.sources import seeds as seedsrc

    args = _build_parser().parse_args(argv)

    overrides: dict = {}
    if args.domain:
        overrides["domains"] = args.domain
    for flag, field in [
        ("include_subdomains", "include_subdomains"),
        ("delay", "delay"), ("timeout", "timeout"), ("depth", "depth"),
        ("concurrency", "concurrency"), ("parallelism", "parallelism"),
        ("debug", "debug"),
    ]:
        v = getattr(args, flag)
        if v is not None:
            overrides[field] = v
    if args.header:
        overrides["headers"] = args.header
    if args.proxy:
        overrides["proxies"] = args.proxy
    if args.checkpoint_dir:
        overrides["checkpoint_dir"] = args.checkpoint_dir
    # fetch-mode precedence: --pages explicitly requests the table
    # double; otherwise YAML/env fetch_mode is respected (flags only
    # override when set), and only an UNCONFIGURED run gets the CLI's
    # real-network default (the dataclass default is "table", which
    # without a pages frame fails fast rather than crawling nothing)
    # first-run scaffold / merge-on-version-change, like the reference's
    # configuration.CreateOrUpdate call on startup (configuration.go:113):
    # a missing -c path gets the default YAML written rather than an error
    if args.configuration:
        CrawlConfig.create_or_update(args.configuration)
    if args.pages:
        overrides["fetch_mode"] = "table"
    else:
        import os

        configured = os.environ.get("XCRAWL3R_FETCH_MODE") is not None
        if args.configuration and not configured:
            import yaml

            with open(args.configuration) as fh:
                configured = "fetch_mode" in (yaml.safe_load(fh) or {})
        if not configured:
            overrides["fetch_mode"] = "http"
    cfg = CrawlConfig.from_yaml(args.configuration, **overrides)

    own_session = spark is None
    if own_session:
        from xcrawl3r_spark.session import get_spark

        spark = get_spark(app="xcrawl3r_spark", master=args.master)

    # seeds: -u URLs + -l list + piped stdin (main.go:166-199)
    seed_frames = []
    if args.url:
        seed_frames.append(seedsrc.seeds_from_urls(spark, args.url))
    if args.list_file:
        seed_frames.append(seedsrc.seeds_from_list_file(spark, args.list_file))
    try:
        stdin_df = seedsrc.seeds_from_stdin(spark)  # empty frame on a tty
    except OSError:        # stdin closed/captured (e.g. a test harness)
        stdin_df = None
    if stdin_df is not None and not stdin_df.isEmpty():
        seed_frames.append(stdin_df)
    if not seed_frames:
        print("no seeds: pass -u/-l or pipe URLs on stdin", file=sys.stderr)
        return 2
    seeds = seed_frames[0]
    for f in seed_frames[1:]:
        seeds = seeds.unionByName(f)

    pages = spark.read.parquet(args.pages) if args.pages else None
    crawler = Crawler(spark, cfg)

    # stream results AS DISCOVERED: the reference's consumer prints each
    # ResultURL off a channel while the crawl runs (main.go:296-307), so
    # each iteration's D3 emit increment goes to stdout the moment it
    # commits — a long crawl shows progress continuously instead of
    # dumping everything after the loop. Within an iteration the order is
    # the engine's deterministic tie-break; the concatenation across
    # iterations equals the post-hoc res.edges stream exactly.
    emitted = [0]

    def stream_edges(it: int, edges_it) -> None:
        for row in edges_it.select("url").toLocalIterator():
            print(row["url"], flush=True)
            emitted[0] += 1

    if args.resume:
        # resumed runs stitch committed history in front of the new tail;
        # the stdout stream must carry the WHOLE stitched multiset (same
        # contract as an uninterrupted run), so print post-hoc here
        # instead of streaming only the fresh iterations
        res = crawler.resume(seeds, pages)
        for row in res.edges.select("url").toLocalIterator():
            print(row["url"], flush=True)
            emitted[0] += 1
    else:
        res = crawler.crawl(seeds, pages, on_iteration=stream_edges)

    if args.output:
        out_urls = res.edges.select("url")
        written = (
            sinks.write_jsonl(out_urls, args.output) if args.jsonl
            else sinks.write_txt(out_urls, args.output))
        if not args.silent:
            print(f"wrote {written}", file=sys.stderr)
    if not args.silent:
        print(f"{emitted[0]} URLs emitted, {res.seen.count()} visited, "
              f"{res.errors.count()} errors, "
              f"{res.iterations} iterations", file=sys.stderr)
    if own_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
