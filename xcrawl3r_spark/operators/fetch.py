"""S4: the real HTTP fetch stage (flag-gated; Arrow-batched mapInPandas).

The sandbox default fetch is the deterministic ``frontier ⋈ pages`` join
(plans/crawl.py) — the test double. Setting ``CrawlConfig.fetch_mode =
"http"`` swaps in this stage, which fetches each selected frontier row
over the network and honors the reference's transport knobs
(pkg/xcrawl3r/xcrawl3r.go:285-341):

- ``cfg.headers`` — "Name: value" strings injected per request
  (xcrawl3r.go:285-305);
- ``cfg.timeout`` — request timeout in seconds, applied to dial + read
  (xcrawl3r.go:311-317);
- ``cfg.proxies`` — round-robin proxy URLs per request
  (xcrawl3r.go:332-341);
- ``cfg.concurrency`` — in-flight requests per task (main.go:183-185's
  worker-pool C, here the per-partition I/O thread-pool width).

Output schema = input columns + (content_type, body, status), exactly the
shape the pages join produces, so the downstream error-split/extraction
pipeline is identical for both modes. Failures never throw: HTTP errors
carry their status code with a null body; network/timeout errors carry a
null status — the crawl loop's error branch records both (per-row error
capture, never task failure).

Scale posture: the stage is embarrassingly parallel (one task per frontier
partition, no shuffle introduced); the upstream salted repartition spreads
hot hosts so one host's fetches never serialize a single task, and
politeness has already capped per-(seed,host) volume. I/O-bound threads
inside the task keep executor cores busy without oversubscribing Python
compute.
"""

from __future__ import annotations

import itertools
from typing import TYPE_CHECKING, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from xcrawl3r_spark.config import CrawlConfig

FETCH_FIELDS = [
    StructField("content_type", StringType()),
    StructField("body", StringType()),
    StructField("status", IntegerType()),
]

#: default User-Agent when cfg.headers sets none — the analog of the
#: reference CLI's always-appended identity header
#: "<name> <version> (repo url)" (cmd/xcrawl3r/main.go:259-265; user
#: headers are appended after it, so an explicit UA overrides).
DEFAULT_USER_AGENT = (
    "xcrawl3r_spark (compatible; xcrawl3r 1.2.0 "
    "https://github.com/hueristiq/xcrawl3r)"
)


def parse_header_lines(headers: list[str]) -> list[tuple[str, str]]:
    """"Name: value" strings -> header pairs; malformed lines (no colon)
    are dropped, matching the reference's split-on-first-colon parse
    (xcrawl3r.go:291-299)."""
    out = []
    for h in headers or []:
        if ":" in h:
            k, v = h.split(":", 1)
            if k.strip():
                out.append((k.strip(), v.strip()))
    return out


def http_fetch(df: DataFrame, cfg: "CrawlConfig") -> DataFrame:
    """Fetch each row's ``url`` over HTTP(S); append content_type/body/
    status columns. Stdlib-only (urllib) so executors need no extra
    packages."""
    headers = parse_header_lines(cfg.headers)
    if not any(k.lower() == "user-agent" for k, _ in headers):
        headers.append(("User-Agent", DEFAULT_USER_AGENT))
    timeout = max(1, int(cfg.timeout))
    proxies = [p for p in (cfg.proxies or []) if p]
    workers = max(1, int(cfg.concurrency))
    # Referer = the page the link was found on (extensions.Referer,
    # pkg/xcrawl3r/xcrawl3r.go:307). The frontier carries src_url; rows
    # without one (seeds, replayed frontiers) send no Referer, and the
    # extension overrides an explicit Referer header when a source page
    # IS known — matching the reference's registration order (the
    # extension hooks after the header-injection callback).
    has_src = "src_url" in df.columns

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        rr = itertools.count()  # per-task proxy round-robin (xcrawl3r.go:332)

        def one(url: str, referer: str | None = None) -> tuple:
            req = urllib.request.Request(url)
            for k, v in headers:
                req.add_header(k, v)
            if referer is not None:
                req.remove_header("Referer")
                req.add_header("Referer", referer)
            handlers = []
            if proxies:
                p = proxies[next(rr) % len(proxies)]
                handlers.append(
                    urllib.request.ProxyHandler({"http": p, "https": p}))
            opener = urllib.request.build_opener(*handlers)
            try:
                with opener.open(req, timeout=timeout) as resp:
                    ct = resp.headers.get_content_type()
                    charset = resp.headers.get_content_charset() or "utf-8"
                    body = resp.read().decode(charset, errors="replace")
                    return ct, body, int(resp.status)
            except urllib.error.HTTPError as e:
                return None, None, int(e.code)   # 4xx/5xx: keep the code
            except Exception:
                return None, None, None          # dial/timeout/DNS: no status

        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                urls = pdf["url"].astype(str)
                refs = (
                    [r if isinstance(r, str) else None
                     for r in pdf["src_url"].tolist()]
                    if has_src else [None] * len(pdf)
                )
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    res = list(ex.map(one, urls, refs))
            else:
                res = []
            out["content_type"] = pd.Series(
                [r[0] for r in res], dtype="object", index=pdf.index)
            out["body"] = pd.Series(
                [r[1] for r in res], dtype="object", index=pdf.index)
            out["status"] = pd.array(
                [r[2] for r in res], dtype="Int32")
            yield out

    schema = StructType(list(df.schema.fields) + FETCH_FIELDS)
    return df.mapInPandas(fetch_batches, schema)


def http_fetch_payloads(df: DataFrame, cfg: "CrawlConfig") -> DataFrame:
    """Binary twin of ``http_fetch`` for the media/image branch: GET each
    row's ``url`` and append (bytes, content_type, status) with the
    payload UNDECODED (images are opaque binary per the input_hint
    posture — charset decoding would corrupt them). Same transport knobs
    (timeout/headers/proxies/concurrency), same per-row error capture
    (failures carry null bytes, never task failures).

    The crawl loop uses this when ``fetch_mode="http"`` and no payload
    table is supplied: discovered image URLs fetch their real payloads,
    which then flow into the decode+verify Arrow stage unchanged."""
    from pyspark.sql.types import BinaryType

    headers = parse_header_lines(cfg.headers)
    if not any(k.lower() == "user-agent" for k, _ in headers):
        headers.append(("User-Agent", DEFAULT_USER_AGENT))
    timeout = max(1, int(cfg.timeout))
    proxies = [p for p in (cfg.proxies or []) if p]
    workers = max(1, int(cfg.concurrency))

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        rr = itertools.count()

        def one(url: str) -> tuple:
            req = urllib.request.Request(url)
            for k, v in headers:
                req.add_header(k, v)
            handlers = []
            if proxies:
                p = proxies[next(rr) % len(proxies)]
                handlers.append(
                    urllib.request.ProxyHandler({"http": p, "https": p}))
            opener = urllib.request.build_opener(*handlers)
            try:
                with opener.open(req, timeout=timeout) as resp:
                    return (resp.read(), resp.headers.get_content_type(),
                            int(resp.status))
            except urllib.error.HTTPError as e:
                return None, None, int(e.code)
            except Exception:
                return None, None, None

        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    res = list(ex.map(one, pdf["url"].astype(str)))
            else:
                res = []
            out["bytes"] = pd.Series(
                [r[0] for r in res], dtype="object", index=pdf.index)
            out["payload_content_type"] = pd.Series(
                [r[1] for r in res], dtype="object", index=pdf.index)
            out["payload_status"] = pd.array(
                [r[2] for r in res], dtype="Int32")
            yield out

    schema = StructType(list(df.schema.fields) + [
        StructField("bytes", BinaryType()),
        StructField("payload_content_type", StringType()),
        StructField("payload_status", IntegerType()),
    ])
    return df.mapInPandas(fetch_batches, schema)
