"""URL canonicalization + host rollup: hand-pinned canonical forms,
idempotence, keeper election, and rollup arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import web


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(web.canonical_url("url").alias("c")).collect()]


def test_canonical_url_hand_cases(spark):
    cases = {
        # host case + www + default port + fragment
        "HTTP://WWW.Example.COM:80/a/b#frag": "http://example.com/a/b",
        # https default port stripped, non-default kept
        "https://Example.com:443/x": "https://example.com/x",
        "https://example.com:8443/x": "https://example.com:8443/x",
        # trailing + doubled slashes
        "http://h.io/a//b///c/": "http://h.io/a/b/c",
        # root path strips to empty
        "http://h.io/": "http://h.io",
        # query sorting + tracking-param removal
        "http://h.io/p?z=1&a=2&utm_source=x&fbclid=abc": "http://h.io/p?a=2&z=1",
        # all params tracking -> no query at all
        "http://h.io/p?utm_campaign=c&gclid=g": "http://h.io/p",
        # empty params from && are dropped
        "http://h.io/p?b=1&&a=2": "http://h.io/p?a=2&b=1",
        # only ONE leading www label is stripped
        "http://www.www.h.io/": "http://www.h.io",
        # ref is a tracking param; REF= inside a VALUE survives
        "http://h.io/p?ref=tw&q=ref=ok": "http://h.io/p?q=ref=ok",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_canonical_url_idempotent(spark):
    raw = [
        "HTTP://WWW.Example.COM:80/a//b/?z=1&a=2&utm_source=x#f",
        "https://Site3.example.com:8443/cat//item/?page=2&q=t",
        "http://h.io/",
    ]
    once = _canon(spark, raw)
    twice = _canon(spark, once)
    assert once == twice


def test_url_dedup_keep_first_elects_min_id(spark):
    rows = [
        (1, "http://A.io/x?b=2&a=1"),
        (2, "http://a.io/x/?a=1&b=2#frag"),       # same canonical as 1
        (3, "http://WWW.a.io:80/x?a=1&utm_id=9&b=2"),  # same again
        (4, "http://a.io/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = web.url_dedup_keep_first(df).orderBy("doc_id").collect()
    assert [r["is_kept"] for r in out] == [True, False, False, True]
    assert len({r["canonical_url"] for r in out}) == 2


def test_host_rollup_counts_and_words(spark):
    rows = [
        (1, "http://a.io/x", "one two three"),
        (2, "http://WWW.A.io/x", "four five"),        # dup of 1's URL
        (3, "http://a.io/y", "six"),
        (4, "http://b.io/z", ""),                      # empty text -> 0 words
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r["host"]: r for r in web.host_rollup(df).collect()}
    a = got["a.io"]
    assert (a["n_docs"], a["n_urls"], a["n_dup_docs"]) == (3, 2, 1)
    assert a["total_words"] == 6
    assert a["avg_words"] == 2.0
    b = got["b.io"]
    assert (b["n_docs"], b["n_urls"], b["n_dup_docs"], b["total_words"]) == (
        1, 1, 0, 0,
    )


def test_frontier_schedule_politeness_and_interleave(spark):
    rows = [
        (1, "http://a.io/1", 10),
        (2, "http://a.io/2", 30),
        (3, "http://a.io/3", 20),
        (4, "http://b.io/1", 5),
        (5, "http://b.io/2", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, priority long")
    out = {r["doc_id"]: r for r in web.frontier_schedule(df).collect()}
    # within a host: higher priority first
    assert [out[i]["tick"] for i in (2, 3, 1)] == [0, 1, 2]
    assert [out[i]["tick"] for i in (5, 4)] == [0, 1]
    # one fetch per host per tick; ticks interleave hosts round-robin
    # (hosts sorted: a.io -> idx 0, b.io -> idx 1; n_hosts = 2)
    assert out[2]["crawl_order"] == 0 and out[5]["crawl_order"] == 1
    assert out[3]["crawl_order"] == 2 and out[4]["crawl_order"] == 3
    assert out[1]["crawl_order"] == 4
    orders = sorted(r["crawl_order"] for r in out.values())
    assert orders == sorted(set(orders))  # total order, no collisions


def test_frontier_schedule_max_per_host_budget(spark):
    rows = [(i, f"http://a.io/{i}", 100 - i) for i in range(6)] + [
        (10, "http://b.io/x", 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, priority long")
    out = web.frontier_schedule(df, max_per_host=3)
    per_host = {r["host"]: 0 for r in out.collect()}
    for r in out.collect():
        per_host[r["host"]] += 1
    assert per_host == {"a.io": 3, "b.io": 1}
