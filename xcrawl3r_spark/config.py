"""Crawl configuration.

Mirrors the reference's ``xcrawl3r.Configuration``
(pkg/xcrawl3r/xcrawl3r.go:366-376) plus batch-engine knobs the north rule
adds (politeness budget per iteration, Bloom sizing, checkpointing, skew
salting). Defaults follow internal/configuration/configuration.go:95-110.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class CrawlConfig:
    # --- reference-faithful knobs -------------------------------------
    #: scope domains; empty -> generic URL scope (xcrawl3r.go:392)
    domains: list[str] = field(default_factory=list)
    #: widen scope regex to subdomains (xcrawl3r.go:411-413)
    include_subdomains: bool = False
    #: max BFS depth; seeds are depth 1; 0 = unbounded
    #: (xcrawl3r.go:274; default 1 per configuration.go:106)
    depth: int = 1
    #: per-host fetch budget per iteration — the batch-time equivalent of
    #: colly LimitRule.Parallelism (xcrawl3r.go:277-281; default 5).
    #: Budget-per-iteration replaces rate-per-second; overflow rows are
    #: re-queued to the next iteration at the same depth.
    parallelism: int = 5
    #: expand each seed with /robots.txt + 12 sitemap paths
    #: (xcrawl3r.go:241-264); disable for pure link-BFS runs
    expand_seeds: bool = True

    # --- batch-engine knobs (north rule) ------------------------------
    #: dedup scope: per-seed (reference-faithful: fresh collector per seed,
    #: xcrawl3r.go:52) or global (strictly cheaper; one seen-set)
    global_dedup: bool = False
    #: enforce robots.txt allow/deny (north rule; the reference only MINES
    #: robots for URLs and ignores its rules, xcrawl3r.go:272)
    obey_robots: bool = False
    #: Bloom pre-filter for the seen anti-join
    bloom_enabled: bool = True
    #: Bloom partitions (hash-range split of the seen set; each partition
    #: has its own bitset so 10^10-scale seen sets never need one giant
    #: broadcast)
    bloom_partitions: int = 8
    #: bits per partition bitset (sized for ~1% FPR at expected load)
    bloom_bits: int = 1 << 20
    bloom_hashes: int = 7
    #: salt buckets for hot-host skew (salted repartition key)
    skew_salt: int = 8
    #: route media-ext URLs (F3 deny-list) into the image-ingest branch
    #: instead of dropping them (north rule)
    ingest_images: bool = True
    #: checkpoint directory for frontier/seen snapshots; None = no
    #: checkpointing (resume disabled)
    checkpoint_dir: str | None = None
    #: shuffle partitions for crawl-stage repartitions; None = session conf
    shuffle_partitions: int | None = None

    def scope_pattern(self) -> str:
        """Build the URL scope regex, ported from xcrawl3r.go:392-414.

        Go RE2 patterns have no backrefs so they port to Java regex
        verbatim. Matching is a *search* (Go ``MatchString``), i.e.
        unanchored — mirrored by using rlike (also a search).
        """
        import re as _re

        if not self.domains:
            return (
                r"https?://([a-z0-9-]+\.)(?:[a-z0-9-]+\.)+[a-z]{2,}(:\d+)?"
                r"(?:/[^?\s#]*)?(?:\?[^#\s]*)?(?:#[^\s]*)?"
            )
        alt = "(?:" + "|".join(_re.escape(d) for d in self.domains) + ")"
        if self.include_subdomains:
            host = r"([a-z0-9-]+\.)*" + alt
        else:
            host = r"(www\.)?" + alt
        return (
            r"https?://" + host + r"(:\d+)?"
            r"(?:/[^?\s#]*)?(?:\?[^#\s]*)?(?:#[^\s]*)?"
        )
