#!/usr/bin/env python
"""Scale probe for the composite queries (r4 verdict item 7): run the
heaviest pipelines on m-times-replicated sf0.1 `documents` input and
check runtime grows ~linearly (no fan-out blowup, no driver-side
materialization creeping in as the input grows).

The sandbox ships no sf1 parquet, so scale is synthesized by DETERMINISTIC
replication of the sf0.1 table (the only permitted input source):

- replica r shifts doc_id by r * 5000 (the sf0.1 id range), so every
  id-derived synthesis (image dims, phash groups, planted URLs) produces
  fresh, distribution-identical rows per replica;
- replica r > 0 interleaves a per-(replica, position) token after every
  word of `text`, so every word 3-shingle contains a replica-unique token
  — replicas share ZERO shingles and the corpus-wide dup/near-dup RATE
  stays that of sf0.1 instead of every doc gaining m-1 planted twins
  (which would quadratically inflate pair generation and measure a
  workload no real 10x corpus has);
- `source` is unchanged: per-source cardinality grows m-fold, exactly how
  a bigger crawl of the same hosts scales.

Usage: python tools/scale_probe.py [mults] [key ...]
       mults default "1,4,16"; keys default the four composites.
Prints one JSON line and writes BENCH/scale_probe.json.

Run on an IDLE machine (CLAUDE.md bench discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ID_SPAN = 5000  # sf0.1 documents doc_id range


def replicated_docs(spark, mult: int):
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    docs = E._t_wide(spark, SF_DIR, "documents")
    if mult == 1:
        return docs
    r = F.explode(F.array(*[F.lit(i) for i in range(mult)])).alias("r")
    rep = docs.select("*", r)
    words = F.split(F.col("text"), r"\s+")
    # interleave a replica-and-position token after every word: with
    # SHINGLE_K=3 every shingle of a r>0 replica contains one, so
    # replicas are pairwise shingle-disjoint by construction
    injected = F.concat_ws(
        " ",
        F.flatten(F.zip_with(
            words,
            F.sequence(F.lit(0), F.size(words) - 1),
            lambda w, i: F.array(
                w, F.concat(F.lit("zz"), F.col("r").cast("string"),
                            F.lit("q"), i.cast("string"))),
        )),
    )
    return (
        rep.withColumn(
            "doc_id", F.col("doc_id") + F.col("r").cast("long") * ID_SPAN)
        .withColumn(
            "text", F.when(F.col("r") == 0, F.col("text")).otherwise(injected))
        .drop("r")
    )


def probes():
    """key -> callable(docs DataFrame) -> DataFrame, mirroring the
    registered queries()' operator chains on an injected input frame."""
    import __spark_entry__ as E
    from xcrawl3r_spark.operators import dedupops, images
    from xcrawl3r_spark.operators.pipeline import corpus_curate

    from xcrawl3r_spark.operators import textops

    return {
        "corpus_curate": lambda d: corpus_curate(d, budget=1000),
        "dedup_minhash_verified": lambda d: dedupops.minhash_verified_pairs(
            d, threshold=0.2),
        "image_corpus_curate": lambda d: images.curate_images(
            E._dims_images(d, with_phash=True), budget=5000),
        "image_fetch_plan": lambda d: images.fetch_plan(
            images.extract_image_refs(E._refs_pages(d))),
        # r5 additions: the zero-shuffle admission gate (pure map-side
        # cost must scale exactly linearly) and the winnow fp
        # equi-join (pair generation under the posting-list df cap)
        "image_admission": lambda d: images.admission_gate(
            E._admission_images(d), min_side=100),
        "text_winnow_pairs": lambda d: textops.winnow_pairs(
            d, min_shared=2, max_fp_df=E.WINNOW_MAX_FP_DF),
    }


def main() -> None:
    mults = [int(m) for m in (sys.argv[1] if len(sys.argv) > 1
                              else "1,4,16").split(",")]
    from xcrawl3r_spark.session import get_spark

    spark = get_spark(app="scale_probe", master="local[32]",
                      shuffle_partitions=32,
                      extra_conf={"spark.driver.memory": "48g"})
    ps = probes()
    keys = sys.argv[2:] or list(ps)

    out: dict[str, dict] = {k: {} for k in keys}
    import shutil
    import tempfile
    tmp_root = tempfile.mkdtemp(prefix="scale_probe_")

    # warm-up: run EVERY probed pipeline once untimed on the base input so
    # no timed leg carries one-time codegen compile / Arrow worker spin-up
    # (otherwise the lo leg absorbs it and per-row ratios read too low)
    warm = os.path.join(tmp_root, "warm")
    replicated_docs(spark, 1).write.mode("overwrite").parquet(warm)
    wdocs = spark.read.parquet(warm)
    for k in keys:
        ps[k](wdocs).write.format("noop").mode("overwrite").save()
    shutil.rmtree(warm, ignore_errors=True)
    for m in mults:
        # materialize the replicated input once per mult AS PARQUET so the
        # probe times the PIPELINE over a real columnar scan, not the
        # replication explode — and not cached blocks (localCheckpoint's
        # block-manager reads anti-scale at 32 threads; CLAUDE.md)
        path = os.path.join(tmp_root, f"docs_x{m}")
        replicated_docs(spark, m).write.mode("overwrite").parquet(path)
        docs = spark.read.parquet(path)
        rows = docs.count()
        for k in keys:
            t0 = time.perf_counter()
            ps[k](docs).write.format("noop").mode("overwrite").save()
            out[k][str(m)] = round(time.perf_counter() - t0, 3)
        out.setdefault("_input_rows", {})[str(m)] = rows
        shutil.rmtree(path, ignore_errors=True)

    result = {"sf": SF_DIR, "mults": mults, "times": out}
    for k in keys:
        t = out[k]
        lo, hi = str(mults[0]), str(mults[-1])
        # per-row cost ratio: > 1 means super-linear growth
        result.setdefault("per_row_cost_ratio", {})[k] = round(
            (t[hi] / t[lo]) / (mults[-1] / mults[0]), 3)
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scale_probe.json", "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    shutil.rmtree(tmp_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
