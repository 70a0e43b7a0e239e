"""E1-E4: link extraction as an Arrow-batched ``mapInPandas`` operator.

UDTF-shaped: each fetched page row fans out to N occurrence rows
(src_url, url, kind). This is the one genuinely non-relational hot-path
stage (HTML/regex parsing), so it runs as a vectorized pandas stage; all
filtering around it stays JVM-side so Catalyst can push scope/ext
predicates below the shuffle.

Emits per-occurrence (never deduped here) to preserve the reference's
emit-before-visit multiset semantics (pkg/xcrawl3r/xcrawl3r.go:117-122,
148-153, 178-183; SURVEY §2.4 D3). The '.min.'-stripped variants of src
URLs are returned as kind='minvisit' rows — visit-only: they feed the next
frontier but are excluded from the edges output (xcrawl3r.go:194-205).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from xcrawl3r_spark.functions import urls as U
from xcrawl3r_spark.functions.extraction import extract_occurrences

EXTRACT_SCHEMA = (
    "seed_id string, src_url string, url string, kind string, depth int"
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["seed_id", "src_url", "url", "kind", "depth"]
    for pdf in batches:
        rows = []
        for seed_id, url, depth, ctype, body, is_file in zip(
            pdf["seed_id"], pdf["url"], pdf["depth"], pdf["content_type"],
            pdf["body"], pdf["is_file"],
        ):
            if body is None:
                continue
            for absu, kind in extract_occurrences(url, ctype, body, bool(is_file)):
                rows.append((seed_id, url, absu, kind, depth))
                if kind == "src":
                    mv = U.min_variant(absu)
                    if mv:
                        rows.append((seed_id, url, mv, "minvisit", depth))
        yield pd.DataFrame(rows, columns=cols)


def extract_links(fetched: DataFrame) -> DataFrame:
    """fetched(seed_id, url, depth, content_type, body, is_file) ->
    occurrences(seed_id, src_url, url, kind, depth)."""
    cols = ["seed_id", "url", "depth", "content_type", "body", "is_file"]
    return fetched.select(*cols).mapInPandas(_extract_batches, EXTRACT_SCHEMA)
