"""Pure-Python reference simulator — the crawl-parity oracle.

Implements the reference's crawl semantics *exactly* as documented in
SURVEY.md §2/§3 (pkg/xcrawl3r/xcrawl3r.go), standing in for running the Go
binary (which needs live HTTP). The Spark engine is tested against this
simulator on the same synthetic ``pages`` graph: identical final URL-seen
set per seed, identical ``edges`` multiset, identical image-URL set.

Semantics captured (file:line in the reference):
- per-seed fresh collector => per-seed seen-set (xcrawl3r.go:52)
- seed expansion: seed, .min. variant, robots.txt, 12 sitemaps (:225-267)
- URLFilters scope regex applied at visit time (:273) and emit time (:352)
- MaxDepth: seed visits are depth 1; requests with depth > cfg.depth are
  refused; depth 0 = unbounded (:274)
- visited-check marks URL seen at request time, BEFORE the media abort, so
  aborted media URLs still enter the seen set (colly v2.2.0 requestCheck)
- media-ext abort: no fetch, no extraction (:68-75)
- file-ext => regex extraction over cleaned body (:93-133); HTML =>
  [href] then [src] extraction (:135-206); other content types => nothing
- emit-BEFORE-visit, emits never deduped (multiset), visits deduped
  (:117-124, :148-155, :178-185)
- .min. variant of src URLs and seeds: visit-only, never emitted
  (:194-205, :237-239)

This module shares the scalar URL kernel with the Spark operators
(functions/urls.py) so parity is by construction.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from xcrawl3r_spark.config import CrawlConfig
from xcrawl3r_spark.functions import urls as U


@dataclass
class SimResult:
    #: per-seed final URL-seen set: {(seed_id, url)}
    seen: set[tuple[str, str]] = field(default_factory=set)
    #: crawl-ordering parity surface: {(seed_id, url, first_visit_depth)}
    #: — FIFO BFS gives each URL its minimum depth, the deterministic
    #: equivalence class of "crawl ordering" (SURVEY §2.6 A5)
    seen_depths: set[tuple[str, str, int]] = field(default_factory=set)
    #: emit-per-occurrence multiset: [(seed_id, src_url, url, kind, depth)]
    edges: list[tuple[str, str, str, str, int]] = field(default_factory=list)
    #: media URLs discovered (image branch input): {(seed_id, url)}
    images: set[tuple[str, str]] = field(default_factory=set)
    #: fetch errors: [(seed_id, url, error)]
    errors: list[tuple[str, str, str]] = field(default_factory=list)


from xcrawl3r_spark.functions.extraction import extract_occurrences as _extract_occ


def _extract(page_url: str, content_type: str, body: str, is_file: bool):
    """Yield (url, kind) occurrences exactly as the reference callbacks do
    — shared kernel with the Spark extraction operator."""
    yield from _extract_occ(page_url, content_type, body, is_file)


def simulate_crawl(
    seeds: list[tuple[str, str]],
    pages: dict[str, tuple[str, str, int]],
    cfg: CrawlConfig,
) -> SimResult:
    """BFS crawl of the synthetic graph.

    seeds: [(seed_id, raw_url)]
    pages: {url: (content_type, body, status)}

    Politeness note: colly's LimitRule is time-domain (in-flight cap) and
    does not change WHAT gets crawled, only when — so the simulator ignores
    it; the Spark engine's budget/overflow-requeue likewise never drops
    URLs, so final seen/edges sets agree.
    """
    import re

    scope_re = re.compile(cfg.scope_pattern())
    out = SimResult()

    for seed_id, raw in seeds:
        canon = U.canonicalize(raw)
        if not canon:
            continue
        visited: dict[str, int] = {}  # url -> first-visit depth (BFS min)
        if cfg.expand_seeds:
            targets = U.expand_seed_targets(canon)
        else:
            targets = [canon]
            mv = U.min_variant(canon)
            if mv:
                targets.append(mv)

        # queue of (url, depth); seed visits are depth 1 (colly convention)
        queue: deque[tuple[str, int]] = deque((t, 1) for t in targets)

        while queue:
            url, depth = queue.popleft()
            # URLFilters at visit time (xcrawl3r.go:273) — unanchored search
            if not scope_re.search(url):
                continue
            # MaxDepth (depth 0 = unbounded)
            if cfg.depth > 0 and depth > cfg.depth:
                continue
            # visited-check (marks seen even if the request aborts below)
            if url in visited:
                continue
            visited[url] = depth
            # media abort (xcrawl3r.go:68-75): no fetch — but the north
            # rule routes image exts to the payload branch
            if U.is_media_url(url):
                if U.is_image_url(url):
                    out.images.add((seed_id, url))
                continue
            page = pages.get(url)
            if page is None:
                out.errors.append((seed_id, url, "fetch failed"))
                continue
            content_type, body, status = page
            if status != 200:
                out.errors.append((seed_id, url, f"status {status}"))
                continue
            is_file = U.is_file_url(url)
            for absu, kind in _extract(url, content_type, body, is_file):
                if not scope_re.search(absu):
                    continue
                # emit BEFORE visit; emits are never deduped
                out.edges.append((seed_id, url, absu, kind, depth))
                queue.append((absu, depth + 1))
                # .min. variant of src URLs: visit-only (xcrawl3r.go:194-205)
                if kind == "src":
                    mv = U.min_variant(absu)
                    if mv:
                        queue.append((mv, depth + 1))
        out.seen.update((seed_id, u) for u in visited)
        out.seen_depths.update((seed_id, u, d) for u, d in visited.items())
    return out
