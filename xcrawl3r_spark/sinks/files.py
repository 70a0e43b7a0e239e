"""S5-S7: output sinks — stdout / TXT lines / JSONL.

Reference: internal/output/file.go — TXT one URL per line (:73-83), JSONL
``{"url": "..."}`` per line (:85-108, struct :112-114), extension forced to
.txt/.json (:32-41). Spark-native: distributed text/json writers; the
extension forcing applies to the directory name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _force_ext(path: str, ext: str) -> str:
    base, cur = os.path.splitext(path)
    return path if cur == ext else base + ext


def write_txt(urls: DataFrame, path: str, url_col: str = "url") -> str:
    """TXT sink: one URL per line (file.go:73-83)."""
    out = _force_ext(path, ".txt")
    urls.select(F.col(url_col).alias("value")).write.mode("append").text(out)
    return out


def write_jsonl(urls: DataFrame, path: str, url_col: str = "url") -> str:
    """JSONL sink: {"url": ...} per line (file.go:85-108)."""
    out = _force_ext(path, ".json")
    urls.select(F.col(url_col).alias("url")).write.mode("append").json(out)
    return out
