"""§2.8 streaming wrapper: seed files dripped into a directory are crawled
per micro-batch with cross-batch global dedup via the snapshot store."""

import os

from xcrawl3r_spark.config import CrawlConfig
from xcrawl3r_spark.sources import datagen as G
from xcrawl3r_spark.streaming.stream import StreamingCrawler

P = G.GraphParams(hosts=3, pages_per_host=5)


def test_streaming_seed_replay(spark, tmp_path):
    seed_dir = tmp_path / "seeds"
    os.makedirs(seed_dir)
    with open(seed_dir / "batch1.txt", "w") as f:
        f.write("https://h0.test/p/0\n\nhttps://h1.test/p/0\n")

    cfg = CrawlConfig(
        domains=["test"], include_subdomains=True, depth=1,
        global_dedup=True, bloom_enabled=False,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    pages = G.pages_df(spark, P, distributed=False)
    sc = StreamingCrawler(spark, cfg, pages)
    q = sc.start(str(seed_dir))
    q.awaitTermination(120)

    store = sc.crawler.store
    seen1 = store.read("seen")
    assert seen1 is not None
    n1 = seen1.count()
    assert n1 > 0
    urls1 = {r["url"] for r in seen1.collect()}
    assert "https://h0.test/p/0" in urls1

    # second drip: one duplicate seed + one new -> only new URLs added
    with open(seed_dir / "batch2.txt", "w") as f:
        f.write("https://h0.test/p/0\nhttps://h2.test/p/0\n")
    q2 = sc.start(str(seed_dir))
    q2.awaitTermination(120)
    seen2 = store.read("seen")
    urls2 = [r["url"] for r in seen2.collect()]
    assert len(urls2) == len(set(urls2))      # no re-crawl of known URLs
    assert "https://h2.test/p/0" in set(urls2)
    assert set(urls1) <= set(urls2)
