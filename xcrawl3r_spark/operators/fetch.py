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


def _transport(cfg: "CrawlConfig", binary: bool):
    """Shared request machinery for the text and binary fetch stages:
    one place owns header/UA injection, the Referer extension, proxy
    round-robin, timeouts, the payload size cap, and per-row error
    capture — so transport fixes can never diverge between the two
    (they did once: Referer initially existed only on the text side).

    Returns (make_one, workers): ``make_one()`` must be called INSIDE
    the executor task (it owns the per-task proxy round-robin counter)
    and yields ``one(url, referer)`` ->
    (payload, content_type, status, outcome) where payload is a decoded
    str (text mode) or raw bytes (binary mode); None payload on any
    non-"fetched" outcome, status kept whenever the server answered.

    ``outcome`` is the explicit transport marker so callers never have
    to infer what happened from null-patterns (a null payload is
    ambiguous between truncated and failed; a non-image content type on
    a 200 is a COMPLETED fetch, not a failure):
    - ``"fetched"``   — 2xx response, payload fully read (payload
      non-null; content type may still be anything);
    - ``"truncated"`` — response exceeded cfg.max_payload_bytes
      (binary mode only; payload dropped, ct+status kept);
    - ``"http_error"`` — server answered 4xx/5xx (status kept);
    - ``"failed"``    — dial/timeout/DNS/TLS error (no status)."""
    headers = parse_header_lines(cfg.headers)
    if not any(k.lower() == "user-agent" for k, _ in headers):
        headers.append(("User-Agent", DEFAULT_USER_AGENT))
    timeout = max(1, int(cfg.timeout))
    proxies = [p for p in (cfg.proxies or []) if p]
    workers = max(1, int(cfg.concurrency))
    tls_skip_verify = bool(getattr(cfg, "tls_skip_verify", True))
    if tls_skip_verify:
        # once-per-stage driver-side notice: the reference-parity default
        # accepts any certificate (InsecureSkipVerify, xcrawl3r.go:319),
        # which silently admits MITM'd responses into the corpus —
        # operators crawling trusted infra should see the posture and can
        # set tls_skip_verify=False to verify against the trust store
        import logging

        logging.getLogger("xcrawl3r_spark.fetch").warning(
            "TLS certificate verification is OFF for live fetches "
            "(tls_skip_verify=True, reference-parity default)")
    max_bytes = (
        int(getattr(cfg, "max_payload_bytes", 0)) or None
    ) if binary else None

    def make_one():
        import ssl
        import urllib.error
        import urllib.request

        rr = itertools.count()  # per-task proxy round-robin (xcrawl3r.go:332)
        # reference-faithful TLS posture: InsecureSkipVerify: true
        # (xcrawl3r.go:319) — a self-signed/expired-cert host fetches
        # instead of landing in errors; cfg.tls_skip_verify=False
        # restores default verification
        if tls_skip_verify:
            ssl_ctx = ssl.create_default_context()
            ssl_ctx.check_hostname = False
            ssl_ctx.verify_mode = ssl.CERT_NONE
        else:
            ssl_ctx = None

        def one(url: str, referer: str | None = None) -> tuple:
            req = urllib.request.Request(url)
            for k, v in headers:
                req.add_header(k, v)
            # Referer = the discovering page (extensions.Referer,
            # xcrawl3r.go:307); overrides an explicit header when a
            # source page IS known, matching the reference's
            # registration order
            if referer is not None:
                req.remove_header("Referer")
                req.add_header("Referer", referer)
            handlers = []
            if ssl_ctx is not None:
                handlers.append(urllib.request.HTTPSHandler(context=ssl_ctx))
            if proxies:
                p = proxies[next(rr) % len(proxies)]
                handlers.append(
                    urllib.request.ProxyHandler({"http": p, "https": p}))
            opener = urllib.request.build_opener(*handlers)
            try:
                with opener.open(req, timeout=timeout) as resp:
                    ct = resp.headers.get_content_type()
                    status = int(resp.status)
                    if max_bytes is not None:
                        # size cap: a bounded read keeps an oversized
                        # payload a PER-ROW failure (null payload, status
                        # kept), never an executor OOM — media URLs are
                        # exactly the large-binary class
                        data = resp.read(max_bytes + 1)
                        if len(data) > max_bytes:
                            return None, ct, status, "truncated"
                    else:
                        data = resp.read()
                    if binary:
                        return data, ct, status, "fetched"
                    charset = resp.headers.get_content_charset() or "utf-8"
                    return (data.decode(charset, errors="replace"),
                            ct, status, "fetched")
            except urllib.error.HTTPError as e:
                return None, None, int(e.code), "http_error"  # keep the code
            except Exception:
                return None, None, None, "failed"  # dial/timeout/DNS: no status

        return one

    return make_one, workers


def _referers(pdf: pd.DataFrame, has_src: bool) -> list:
    if not has_src:
        return [None] * len(pdf)
    return [r if isinstance(r, str) else None
            for r in pdf["src_url"].tolist()]


def http_fetch(df: DataFrame, cfg: "CrawlConfig") -> DataFrame:
    """Fetch each row's ``url`` over HTTP(S); append content_type/body/
    status columns. Stdlib-only (urllib) so executors need no extra
    packages. Transport knobs + Referer/UA handling live in
    ``_transport`` (shared with the binary payload stage)."""
    make_one, workers = _transport(cfg, binary=False)
    has_src = "src_url" in df.columns

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        one = make_one()
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    res = list(ex.map(one, pdf["url"].astype(str),
                                      _referers(pdf, has_src)))
            else:
                res = []
            out["content_type"] = pd.Series(
                [r[1] for r in res], dtype="object", index=pdf.index)
            out["body"] = pd.Series(
                [r[0] for r in res], dtype="object", index=pdf.index)
            out["status"] = pd.array(
                [r[2] for r in res], dtype="Int32")
            yield out

    schema = StructType(list(df.schema.fields) + FETCH_FIELDS)
    return df.mapInPandas(fetch_batches, schema)


def http_fetch_payloads(df: DataFrame, cfg: "CrawlConfig") -> DataFrame:
    """Binary twin of ``http_fetch`` for the media/image branch: GET each
    row's ``url`` and append (bytes, payload_content_type,
    payload_status, payload_outcome) with the payload UNDECODED (images
    are opaque binary
    per the input_hint posture — charset decoding would corrupt them).
    Shares ``_transport`` with the text stage: same header/UA/Referer/
    proxy/timeout behavior, same per-row error capture (failures carry
    null bytes, never task failures), plus the ``cfg.max_payload_bytes``
    size cap (oversized payloads become per-row failures with their
    status kept).

    The crawl loop uses this when ``fetch_mode="http"`` and no payload
    table is supplied: discovered image URLs fetch their real payloads,
    which then flow into the decode+characterize Arrow stage."""
    from pyspark.sql.types import BinaryType

    make_one, workers = _transport(cfg, binary=True)
    has_src = "src_url" in df.columns

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        one = make_one()
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                with ThreadPoolExecutor(max_workers=workers) as ex:
                    res = list(ex.map(one, pdf["url"].astype(str),
                                      _referers(pdf, has_src)))
            else:
                res = []
            out["bytes"] = pd.Series(
                [r[0] for r in res], dtype="object", index=pdf.index)
            out["payload_content_type"] = pd.Series(
                [r[1] for r in res], dtype="object", index=pdf.index)
            out["payload_status"] = pd.array(
                [r[2] for r in res], dtype="Int32")
            out["payload_outcome"] = pd.Series(
                [r[3] for r in res], dtype="object", index=pdf.index)
            yield out

    schema = StructType(list(df.schema.fields) + [
        StructField("bytes", BinaryType()),
        StructField("payload_content_type", StringType()),
        StructField("payload_status", IntegerType()),
        StructField("payload_outcome", StringType()),
    ])
    return df.mapInPandas(fetch_batches, schema)
