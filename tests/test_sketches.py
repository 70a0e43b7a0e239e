"""HLL mergeable-sketch operators (operators/sketches.py): accuracy
bounds vs exact counts, and rollup (union-of-shards) coherence."""


def test_approx_distinct_within_bound(spark, sf_dir):
    from xcrawl3r_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {r["event_type"]: r["n_approx"]
              for r in sketches.approx_distinct(
                  ev, ["event_type"], "user_id").collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").agg(
                 __import__("pyspark.sql.functions", fromlist=["countDistinct"])
                 .countDistinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.05 * n), (k, approx[k], n)


def test_approx_distinct_checked_all_within(spark, sf_dir):
    from xcrawl3r_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = sketches.approx_distinct_checked(
        ev, ["event_type"], "user_id").collect()
    assert rows and all(r["within_bound"] for r in rows)


def test_rollup_union_close_to_direct(spark, sf_dir):
    """Per-group sketches unioned globally estimate the same cardinality
    as a single global sketch (mergeable-partial coherence) — and both
    land within 5% of the exact global distinct count."""
    from xcrawl3r_spark.operators import sketches

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    roll = sketches.approx_distinct_rollup(
        ev, "event_type", "user_id").collect()[0]
    direct = sketches.approx_distinct(
        ev.selectExpr("1 as g", "user_id"), ["g"], "user_id"
    ).collect()[0]["n_approx"]
    exact = ev.selectExpr("user_id").distinct().count()
    assert abs(roll["global_approx"] - exact) <= max(2, 0.05 * exact)
    assert abs(direct - exact) <= max(2, 0.05 * exact)
    assert roll["n_groups"] >= 1
