"""Link-extraction kernel shared by the Spark mapInPandas operator and the
pure-Python parity simulator — one implementation, zero drift.

Reference behavior (pkg/xcrawl3r/xcrawl3r.go):
- file bodies (F4 ext set): body cleanup (:100-106) then URL-regex
  FindAllString (:108), each resolved absolute (:111) — kind 'regex'
- HTML bodies: every element with an ``href`` attr (:135-163) then every
  element with a ``src`` attr (:165-206), resolved absolute — kinds
  'href'/'src'. HTML extraction happens only for HTML content types
  (colly OnHTML fires on text/html responses).
- no extraction otherwise
"""

from __future__ import annotations

import re
from typing import Iterator

from xcrawl3r_spark.functions import urls as U

_ATTR_RES = {
    attr: re.compile(rf"""<[a-zA-Z][^>]*\s{attr}\s*=\s*["']([^"']*)["']""")
    for attr in ("href", "src")
}


def extract_occurrences(
    page_url: str, content_type: str, body: str, is_file: bool
) -> Iterator[tuple[str, str]]:
    """Yield (absolute_url, kind) for every link occurrence on the page, in
    reference callback order. No scope filtering, no dedup — emit-per-
    occurrence is the caller's contract (SURVEY §2.4 D3)."""
    if not body:
        return
    if is_file:
        for link in U.extract_urls_regex(body):
            absu = U.absolute_url(page_url, link)
            if absu:
                yield absu, "regex"
        return
    if "html" not in (content_type or ""):
        return
    for attr in ("href", "src"):
        for m in _ATTR_RES[attr].finditer(body):
            absu = U.absolute_url(page_url, m.group(1))
            if absu:
                yield absu, attr
