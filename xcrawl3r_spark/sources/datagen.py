"""Deterministic synthetic web-graph + payload generator (FIXTURES.md).

No external data, no live HTTP, no RNG state: every row is a pure function
of (host_idx, page_idx, seed) via md5-derived integers, so the same graph
can be generated driver-side (tiny test scale) or executor-side via
``mapInPandas`` over ``spark.range`` (bench scale, ~10^6 URLs) with
identical output. The generator is parameterized so the schema extends to
the 10^10-frontier regime by construction (hosts x pages-per-host).

Graph shape: H hosts `h{i}.test`, M HTML pages per host at `/p/{j}`, with a
power-law host-degree skew — host h0 receives ~30% of cross-host edges (the
"hot host" that exercises salted repartition + politeness budgets). Bodies
exercise every extraction branch of the reference
(pkg/xcrawl3r/xcrawl3r.go:93-206): [href]/[src] HTML attrs, relative +
absolute + out-of-scope links, `\\u002f`/`\\u0026` escapes and `*` wildcards
(body cleanup :100-106), `.min.js` references, css/js/txt/xml regex bodies,
robots.txt with Allow/Disallow/Sitemap lines, sitemap.xml `<loc>` entries,
and image URLs the reference refuses to fetch but still emits (:68-75,
:178-183).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from xcrawl3r_spark.functions.imagecodec import encode_image, phash64, synth_pixels


@dataclass(frozen=True)
class GraphParams:
    hosts: int = 10
    pages_per_host: int = 50
    fanout: int = 4           # href links per HTML page
    hot_host_share: float = 0.30
    seed: int = 42

    @property
    def n_pages(self) -> int:
        return self.hosts * self.pages_per_host


def _h(p: GraphParams, *parts) -> int:
    """Deterministic 60-bit integer from parts (md5-based, seed-mixed)."""
    s = "|".join(str(x) for x in (p.seed, *parts))
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def host_name(i: int) -> str:
    return f"h{i}.test"


def page_url(host_idx: int, page_idx: int) -> str:
    return f"https://{host_name(host_idx)}/p/{page_idx}"


def _target_host(p: GraphParams, h: int, j: int, k: int) -> int:
    """Pick the host of outgoing link k: ~30% to hot host 0 (skew), ~50%
    same-host, rest uniform."""
    r = _h(p, "th", h, j, k) % 100
    if r < int(p.hot_host_share * 100):
        return 0
    if r < int(p.hot_host_share * 100) + 50:
        return h
    return _h(p, "tu", h, j, k) % p.hosts


def page_links(p: GraphParams, h: int, j: int) -> list[tuple[int, int]]:
    """Outgoing href targets of HTML page (h, j) as (host_idx, page_idx)."""
    return [
        (_target_host(p, h, j, k), _h(p, "tp", h, j, k) % p.pages_per_host)
        for k in range(p.fanout)
    ]


def image_meta(p: GraphParams, h: int, j: int) -> tuple[str, str, int, int]:
    """(image_url, fmt, w, h) of the image embedded in page (h, j)."""
    fmt = "png" if _h(p, "if", h, j) % 2 == 0 else "jpeg"
    ext = "png" if fmt == "png" else "jpeg"
    w = 8 + _h(p, "iw", h, j) % 57
    ht = 8 + _h(p, "ih", h, j) % 57
    return f"https://{host_name(h)}/img/{j}.{ext}", fmt, w, ht


def html_body(p: GraphParams, h: int, j: int) -> str:
    """HTML body of page (h, j) exercising href/src/escape/min branches."""
    parts = ["<html><body>"]
    for k, (th, tj) in enumerate(page_links(p, h, j)):
        if th == h and _h(p, "rel", h, j, k) % 3 == 0:
            parts.append(f'<a href="/p/{tj}">rel</a>')          # relative link
        elif _h(p, "esc", h, j, k) % 7 == 0:
            # /-escaped URL (exercises body cleanup F7)
            parts.append(
                f'<a href="https:\\u002f\\u002f{host_name(th)}\\u002fp\\u002f{tj}">esc</a>'
            )
        else:
            parts.append(f'<a href="{page_url(th, tj)}">abs</a>')
    # out-of-scope absolute link (dropped by F1 scope filter)
    parts.append(f'<a href="https://offsite-{j}.example.org/x">out</a>')
    img_url, _, _, _ = image_meta(p, h, j)
    parts.append(f'<img src="{img_url}">')                       # media branch
    if _h(p, "css", h, j) % 4 == 0:
        parts.append(f'<link href="https://{host_name(h)}/a/{j}.css">')  # file branch
    if _h(p, "js", h, j) % 5 == 0:
        parts.append(f'<script src="https://{host_name(h)}/s/{j}.min.js"></script>')
    parts.append("</body></html>")
    return "".join(parts)


def css_body(p: GraphParams, h: int, j: int) -> str:
    """css file body: raw URLs for regex extraction (E1) + '*' wildcard."""
    t1 = page_links(p, h, j)[0]
    return (
        f"/* styles */ .x {{ background: url(https://{host_name(t1[0])}/p/{t1[1]}) }}\n"
        f"a* {{ color: red }}\n"
    )


def minjs_body(p: GraphParams, h: int, j: int) -> str:
    t = page_links(p, h, j)[-1]
    return f"fetch('https://{host_name(t[0])}/p/{t[1]}');"


def robots_body(p: GraphParams, h: int) -> str:
    return (
        "User-agent: *\n"
        f"Disallow: /private/\n"
        f"Allow: /p/\n"
        f"Sitemap: https://{host_name(h)}/sitemap.xml\n"
        f"# see https://{host_name(h)}/p/0\n"
    )


def sitemap_body(p: GraphParams, h: int) -> str:
    locs = "".join(
        f"<url><loc>{page_url(h, j)}</loc></url>"
        for j in range(0, min(5, p.pages_per_host))
    )
    return f'<?xml version="1.0"?><urlset>{locs}</urlset>'


def pages_rows(p: GraphParams) -> Iterator[dict]:
    """All fetchable rows of the `pages` table (FIXTURES.md §1)."""
    for h in range(p.hosts):
        yield {
            "url": f"https://{host_name(h)}/robots.txt",
            "content_type": "text/plain",
            "body": robots_body(p, h),
            "status": 200,
        }
        yield {
            "url": f"https://{host_name(h)}/sitemap.xml",
            "content_type": "application/xml",
            "body": sitemap_body(p, h),
            "status": 200,
        }
        for j in range(p.pages_per_host):
            yield {
                "url": page_url(h, j),
                "content_type": "text/html",
                "body": html_body(p, h, j),
                "status": 200,
            }
            if _h(p, "css", h, j) % 4 == 0:
                yield {
                    "url": f"https://{host_name(h)}/a/{j}.css",
                    "content_type": "text/css",
                    "body": css_body(p, h, j),
                    "status": 200,
                }
            if _h(p, "js", h, j) % 5 == 0:
                yield {
                    "url": f"https://{host_name(h)}/s/{j}.min.js",
                    "content_type": "application/javascript",
                    "body": minjs_body(p, h, j),
                    "status": 200,
                }
                # the .min.-stripped variant exists too (E4 visit hits it)
                yield {
                    "url": f"https://{host_name(h)}/s/{j}.js",
                    "content_type": "application/javascript",
                    "body": minjs_body(p, h, j),
                    "status": 200,
                }


PAGES_SCHEMA = "url string, content_type string, body string, status int"
SEEDS_SCHEMA = "seed_id string, url string"
IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def pages_dict(p: GraphParams) -> dict[str, tuple[str, str, int]]:
    """pages as {url: (content_type, body, status)} for the simulator."""
    return {
        r["url"]: (r["content_type"], r["body"], r["status"])
        for r in pages_rows(p)
    }


def seeds_rows(p: GraphParams, n_seeds: int = 3) -> list[dict]:
    """Seed list: scheme-less (exercises default-https canonicalization),
    plain, and .min.-containing seeds (FIXTURES.md §2)."""
    out = []
    for i in range(n_seeds):
        h = i % p.hosts
        if i % 3 == 1:
            url = f"{host_name(h)}/p/0"          # scheme-less
        elif i % 3 == 2 and _h(p, "js", h, 1) % 5 == 0:
            url = f"https://{host_name(h)}/s/1.min.js"
        else:
            url = page_url(h, 0)
        out.append({"seed_id": f"s{i:03d}", "url": url})
    return out


def image_row(p: GraphParams, h: int, j: int) -> dict:
    """Iceberg-shaped image+caption payload row (input_hint schema)."""
    url, fmt, w, ht = image_meta(p, h, j)
    image_id = hashlib.md5(url.encode()).hexdigest()
    pixels = synth_pixels(image_id, w, ht)
    return {
        "image_id": image_id,
        "bytes": encode_image(pixels, fmt),
        "w": w,
        "h": ht,
        "fmt": fmt,
        "caption": f"caption for {image_id}",
        "phash": phash64(pixels),
        "url": url,
    }


def images_rows(p: GraphParams) -> Iterator[dict]:
    for h in range(p.hosts):
        for j in range(p.pages_per_host):
            yield image_row(p, h, j)


# ---------------------------------------------------------------------------
# Spark-side distributed generation (bench scale) — same pure functions,
# executed executor-side over spark.range so 10^6+ page graphs never
# bottleneck on the driver.
# ---------------------------------------------------------------------------

def pages_df(spark, p: GraphParams, distributed: bool | None = None):
    import pandas as pd

    if distributed is None:
        distributed = p.n_pages > 20_000
    if not distributed:
        return spark.createDataFrame(list(pages_rows(p)), PAGES_SCHEMA)

    hosts, ppw = p.hosts, p.pages_per_host

    def gen(batches):
        for pdf in batches:
            rows = []
            for hj in pdf["id"]:
                h, j = int(hj) // ppw, int(hj) % ppw
                if j == 0:
                    rows.append(
                        (f"https://{host_name(h)}/robots.txt", "text/plain",
                         robots_body(p, h), 200))
                    rows.append(
                        (f"https://{host_name(h)}/sitemap.xml", "application/xml",
                         sitemap_body(p, h), 200))
                rows.append((page_url(h, j), "text/html", html_body(p, h, j), 200))
                if _h(p, "css", h, j) % 4 == 0:
                    rows.append(
                        (f"https://{host_name(h)}/a/{j}.css", "text/css",
                         css_body(p, h, j), 200))
                if _h(p, "js", h, j) % 5 == 0:
                    body = minjs_body(p, h, j)
                    rows.append(
                        (f"https://{host_name(h)}/s/{j}.min.js",
                         "application/javascript", body, 200))
                    rows.append(
                        (f"https://{host_name(h)}/s/{j}.js",
                         "application/javascript", body, 200))
            yield pd.DataFrame(rows, columns=["url", "content_type", "body", "status"])

    n = hosts * ppw
    return (
        spark.range(0, n, 1, numPartitions=max(32, n // 10_000))
        .mapInPandas(gen, PAGES_SCHEMA)
    )


def seeds_df(spark, p: GraphParams, n_seeds: int = 3):
    return spark.createDataFrame(seeds_rows(p, n_seeds), SEEDS_SCHEMA)


def images_df(spark, p: GraphParams, distributed: bool | None = None):
    import pandas as pd

    if distributed is None:
        distributed = p.n_pages > 20_000
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "url"]
    schema = IMAGES_SCHEMA + ", url string"
    if not distributed:
        rows = [[r[c] for c in cols] for r in images_rows(p)]
        return spark.createDataFrame(rows, schema)

    ppw = p.pages_per_host

    def gen(batches):
        for pdf in batches:
            rows = [image_row(p, int(hj) // ppw, int(hj) % ppw) for hj in pdf["id"]]
            yield pd.DataFrame([[r[c] for c in cols] for r in rows], columns=cols)

    n = p.hosts * ppw
    return (
        spark.range(0, n, 1, numPartitions=max(32, n // 5_000))
        .mapInPandas(gen, schema)
    )
