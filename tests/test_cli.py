"""CLI entry point (python -m xcrawl3r_spark): flag surface parity with
cmd/xcrawl3r/main.go — seeds from -u/-l, YAML config + flag precedence,
TXT/JSONL output sinks, stdout emit stream."""

import json
import os

from xcrawl3r_spark.__main__ import main


def _pages_parquet(spark, tmp_path, host="ha", n=6):
    rows = [
        (f"https://{host}.test/p/{i}", "text/html",
         (f'<a href="https://{host}.test/p/{i + 1}">n</a>'
          if i + 1 < n else "<p>end</p>"), 200)
        for i in range(n)
    ]
    path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(
        rows, "url string, content_type string, body string, status int"
    ).write.parquet(path)
    return path


def test_cli_crawl_txt_output(spark, tmp_path, capsys):
    pages = _pages_parquet(spark, tmp_path)
    out = str(tmp_path / "out")
    rc = main([
        "-u", "https://ha.test/p/0", "-d", "test", "--include-subdomains",
        "--depth", "0", "--pages", pages, "-o", out, "--silent",
    ], spark=spark)
    assert rc == 0
    printed = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(printed) == 5                       # 5 followed links emitted
    assert set(printed) == {f"https://ha.test/p/{i}" for i in range(1, 6)}
    txt_dir = out + ".txt"                         # extension forced
    lines = []
    for f in os.listdir(txt_dir):
        if f.startswith("part-"):
            lines += open(os.path.join(txt_dir, f)).read().splitlines()
    assert sorted(lines) == sorted(printed)


def test_cli_jsonl_and_config_precedence(spark, tmp_path, capsys):
    pages = _pages_parquet(spark, tmp_path, host="hb")
    cfgfile = tmp_path / "cfg.yaml"
    cfgfile.write_text("depth: 1\ndomains: [test]\ninclude_subdomains: true\n")
    out = str(tmp_path / "res")
    rc = main([
        "-c", str(cfgfile), "-u", "https://hb.test/p/0",
        "--depth", "0",                            # flag beats YAML
        "--pages", pages, "--jsonl", "-o", out, "--silent",
    ], spark=spark)
    assert rc == 0
    printed = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert len(printed) == 5                       # depth 0 = unbounded
    recs = []
    for f in os.listdir(out + ".json"):
        if f.startswith("part-"):
            recs += [json.loads(ln) for ln in
                     open(os.path.join(out + ".json", f)) if ln.strip()]
    assert {r["url"] for r in recs} == set(printed)


def test_cli_list_file_seeds(spark, tmp_path, capsys):
    pages = _pages_parquet(spark, tmp_path, host="hc", n=3)
    lst = tmp_path / "seeds.txt"
    lst.write_text("https://hc.test/p/0\n\n")
    rc = main(["-l", str(lst), "-d", "test", "--include-subdomains",
               "--depth", "0", "--pages", pages, "--silent"], spark=spark)
    assert rc == 0
    printed = [ln for ln in capsys.readouterr().out.splitlines() if ln]
    assert set(printed) == {"https://hc.test/p/1", "https://hc.test/p/2"}


def test_cli_streams_output_per_iteration(spark, tmp_path, capsys, monkeypatch):
    """The stdout stream is emitted DURING the crawl, one increment per
    committed iteration (the reference consumer prints each ResultURL as
    discovered, main.go:296-307) — not dumped after the loop ends. A
    4-page chain discovers exactly one link per BFS wave, so each
    iteration's stdout drain must hold exactly that wave's URL."""
    import xcrawl3r_spark.plans.crawl as crawlmod

    pages = _pages_parquet(spark, tmp_path, host="he", n=4)
    # pin expansion/budget off so each BFS wave is exactly one page —
    # with defaults the robots/sitemap expansions share iteration slots
    # and the waves shift
    cfgfile = tmp_path / "stream.yaml"
    cfgfile.write_text("expand_seeds: false\nparallelism: 0\n")
    drains = []
    orig = crawlmod.Crawler.crawl

    def spy(self, *a, **kw):
        cb = kw.get("on_iteration")
        assert cb is not None, "CLI must stream via on_iteration"

        def spy_cb(it, df):
            cb(it, df)
            drains.append(
                (it, [ln for ln in capsys.readouterr().out.splitlines()
                      if ln]))

        kw["on_iteration"] = spy_cb
        return orig(self, *a, **kw)

    monkeypatch.setattr(crawlmod.Crawler, "crawl", spy)
    rc = main(["-c", str(cfgfile), "-u", "https://he.test/p/0", "-d", "test",
               "--include-subdomains", "--depth", "0", "--pages", pages,
               "--silent"], spark=spark)
    assert rc == 0
    per_iter = dict(drains)
    assert per_iter[1] == ["https://he.test/p/1"]
    assert per_iter[2] == ["https://he.test/p/2"]
    assert per_iter[3] == ["https://he.test/p/3"]
    # nothing was held back for a post-loop dump
    assert not [ln for ln in capsys.readouterr().out.splitlines() if ln]


def test_cli_no_seeds_errors(spark, capsys):
    rc = main(["-d", "test"], spark=spark)
    assert rc == 2
    assert "no seeds" in capsys.readouterr().err


def test_cli_checkpoint_then_resume(spark, tmp_path, capsys):
    """--checkpoint-dir + --resume: a completed checkpointed run resumes
    as a no-op (nothing new to crawl) and reports the committed history."""
    pages = _pages_parquet(spark, tmp_path, host="hd", n=4)
    ckpt = str(tmp_path / "ckpt")
    args = ["-u", "https://hd.test/p/0", "-d", "test",
            "--include-subdomains", "--depth", "0", "--pages", pages,
            "--checkpoint-dir", ckpt, "--silent"]
    assert main(args, spark=spark) == 0
    first = sorted(ln for ln in capsys.readouterr().out.splitlines() if ln)
    assert main(args + ["--resume"], spark=spark) == 0
    resumed = sorted(ln for ln in capsys.readouterr().out.splitlines() if ln)
    assert resumed == first          # committed history re-reported intact
