"""E7/S9: the image+caption payload branch (north rule — the reference
explicitly refuses image fetches, pkg/xcrawl3r/xcrawl3r.go:68-75,420, while
still emitting them as discovered URLs :178-183; this engine ingests them).

Input: the ``images`` table in exact ``input_hint`` shape
(image_id, bytes:binary, w, h, fmt, caption, phash:long).

``decode_and_verify`` is an Arrow-batched ``mapInPandas`` stage: decode the
binary payload (real PNG codec; deterministic XJPG stand-in for lossy —
functions/imagecodec.py), recompute w/h/phash, check the per-row invariant
vs the reference payload (PSNR >= 40 dB for lossy formats, exact for
lossless, caption byte-equality), and emit per-partition lineage
(TaskContext.partitionId) so every output row is attributable to the task
that produced it — the checkpoint/resume audit trail.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame

from xcrawl3r_spark.functions.imagecodec import (
    decode_image,
    phash64,
    psnr,
    synth_pixels,
)

VERIFY_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, phash long, "
    "decoded_w int, decoded_h int, phash_recomputed long, phash_hamming int, "
    "phash_ok boolean, psnr_db double, "
    "pixel_ok boolean, caption_ok boolean, part_id int"
)

LINEAGE_SCHEMA = "part_id int, n_rows long, n_ok long, stage string"


def _verify_batches_carry(carry: tuple[str, ...],
                          expected_caption: str | None = None,
                          synthetic_pixel_check: bool = True):
    def _caption_ok(r) -> bool:
        if expected_caption is not None:
            return getattr(r, expected_caption) is not None and \
                r.caption == getattr(r, expected_caption)
        # synthetic-corpus fallback: the generator's caption convention
        return r.caption == f"caption for {r.image_id}"

    def _verify_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        part_id = tc.partitionId() if tc is not None else -1
        cols = list(carry) + [
            "image_id", "w", "h", "fmt", "caption", "phash",
            "decoded_w", "decoded_h", "phash_recomputed", "phash_hamming",
            "phash_ok", "psnr_db", "pixel_ok", "caption_ok", "part_id",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                extra = tuple(getattr(r, c) for c in carry)
                if r.bytes is None or r.fmt is None:
                    # payload never fetched (absent from the payload table)
                    rows.append(extra + (r.image_id, r.w, r.h, r.fmt,
                                         r.caption, r.phash,
                                         None, None, None, None, False, None,
                                         False, False, part_id))
                    continue
                try:
                    pixels = decode_image(r.bytes, r.fmt)
                except (ValueError, NotImplementedError):
                    rows.append(extra + (r.image_id, r.w, r.h, r.fmt,
                                         r.caption, r.phash,
                                         None, None, None, None, False, None,
                                         False, False, part_id))
                    continue
                dh, dw = pixels.shape[:2]
                lossless = r.fmt == "png"
                if synthetic_pixel_check:
                    # synthetic-corpus ground truth: regenerate the pixels
                    # (only possible because the test corpus is generated)
                    ref = synth_pixels(r.image_id, r.w, r.h)
                    if ref.shape == pixels.shape:
                        p = psnr(ref, pixels)
                        pixel_ok = bool(
                            np.array_equal(ref, pixels) if lossless
                            else p >= 40.0
                        )
                    else:
                        p, pixel_ok = 0.0, False
                else:
                    # general corpus: the payload-carried phash + dims are
                    # the ground truth (no regenerable reference pixels)
                    p, pixel_ok = None, True
                ph = phash64(pixels)
                # perceptual-hash invariant: exact for lossless; a lossy
                # codec may flip a few low-signal bits -> hamming tol 4
                hamming = bin((ph ^ r.phash) & ((1 << 64) - 1)).count("1")
                phash_ok = hamming == 0 if lossless else hamming <= 4
                if not synthetic_pixel_check:
                    pixel_ok = phash_ok
                rows.append(extra + (
                    r.image_id, r.w, r.h, r.fmt, r.caption, r.phash,
                    dw, dh, ph, hamming, phash_ok,
                    None if p == float("inf") else p,
                    pixel_ok and dw == r.w and dh == r.h, _caption_ok(r),
                    part_id,
                ))
            yield pd.DataFrame(rows, columns=cols)

    return _verify_batches


def decode_and_verify(
    images: DataFrame, carry: tuple[str, ...] = (),
    expected_caption_col: str | None = None,
    synthetic_pixel_check: bool = True,
) -> DataFrame:
    """images (input_hint schema) -> verified rows + per-partition id.

    ``carry`` columns (e.g. seed_id/url/iter from the crawl loop) pass
    through the Arrow stage unchanged and lead the output schema.

    Caption ground truth: if the payload table carries an
    ``expected_caption`` column (or ``expected_caption_col`` names one),
    caption_ok compares against it row-by-row — the general path for a
    reference-captioned corpus. Without one, the synthetic generator's
    caption convention is the fallback (test corpus only).

    ``synthetic_pixel_check=False`` drops the regenerate-and-compare
    pixel check (only meaningful for the synthetic corpus) and verifies
    pixels via the carried phash + decoded dimensions instead."""
    from xcrawl3r_spark.session import ship_package

    ship_package(images.sparkSession)
    if expected_caption_col is None and "expected_caption" in images.columns:
        expected_caption_col = "expected_caption"
    fmap = {f.name: f for f in images.schema.fields}
    carry_schema = "".join(
        f"{c} {fmap[c].dataType.simpleString()}, " for c in carry
    )
    cols = list(carry) + ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    if expected_caption_col is not None and expected_caption_col not in cols:
        cols.append(expected_caption_col)
    return images.select(*cols).mapInPandas(
        _verify_batches_carry(tuple(carry), expected_caption_col,
                              synthetic_pixel_check),
        carry_schema + VERIFY_SCHEMA)


def lineage(verified: DataFrame) -> DataFrame:
    """Per-partition lineage rows (S9): how many rows each task produced
    and how many passed the invariant."""
    from pyspark.sql import functions as F

    return (
        verified.groupBy("part_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                (F.col("pixel_ok") & F.col("caption_ok")).cast("long")
            ).alias("n_ok"),
        )
        .withColumn("stage", F.lit("decode_verify"))
    )
