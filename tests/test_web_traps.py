"""Crawler-trap flags + DUST rule mining (operators/web.py): hand-pinned
flag cases, NULL/schemeless robustness, and a hand-built DUST corpus
with a known irrelevant param."""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import web


def _flags(spark, url):
    df = spark.createDataFrame([(1, url)], "id long, url string")
    return web.url_trap_flags(df).collect()[0]


def test_trap_deep_path(spark):
    r = _flags(spark, "http://h.io/" + "/".join(f"s{i}" for i in range(9)))
    assert r["deep_path"] and r["is_trap"]
    r = _flags(spark, "http://h.io/" + "/".join(f"s{i}" for i in range(8)))
    assert not r["deep_path"] and not r["is_trap"]


def test_trap_repeated_segments(spark):
    assert _flags(spark, "http://h.io/a/b/a/b/a")["repeated_segments"]
    # two occurrences are fine (breadcrumbs), three are a loop
    assert not _flags(spark, "http://h.io/a/b/a")["repeated_segments"]


def test_trap_calendar(spark):
    assert _flags(spark, "http://h.io/2024/2024-05/x")["calendar_trap"]
    assert _flags(spark, "http://h.io/2024-05-01/2024-05-02")["calendar_trap"]
    # one date segment is a normal archive page
    assert not _flags(spark, "http://h.io/blog/2024-05-01")["calendar_trap"]
    # 4-digit item ids are not dates... they are: yyyy matches. But a
    # 5-digit id must not.
    assert not _flags(spark, "http://h.io/item/12345/54321")["calendar_trap"]


def test_trap_session_param(spark):
    assert _flags(spark, "http://h.io/p?jsessionid=ABC")["session_param"]
    assert _flags(spark, "http://h.io/p?PHPSESSID=x")["session_param"]
    # 32-hex value under any key
    assert _flags(spark, "http://h.io/p?t=" + "a" * 32)["session_param"]
    assert not _flags(spark, "http://h.io/p?t=" + "a" * 31)["session_param"]
    assert not _flags(spark, "http://h.io/p?id=42&q=x")["session_param"]


def test_trap_long_query(spark):
    many = "&".join(f"k{i}={i}" for i in range(9))
    assert _flags(spark, f"http://h.io/p?{many}")["long_query"]
    few = "&".join(f"k{i}={i}" for i in range(8))
    assert not _flags(spark, f"http://h.io/p?{few}")["long_query"]
    assert _flags(spark, "http://h.io/p?x=" + "v" * 130)["long_query"]


def test_trap_null_is_all_false_and_relative_still_inspected(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a/b/a/b/a"), (3, "/rel/2024/2024-05?sid=x")],
        "id long, url string",
    )
    rows = {r["id"]: r for r in web.url_trap_flags(df).collect()}
    # NULL: every flag false, never NULL
    for c in ("deep_path", "repeated_segments", "calendar_trap",
              "session_param", "long_query", "is_trap"):
        assert rows[1][c] is False
    # schemeless input is a relative reference: path/query still inspected
    assert rows[2]["repeated_segments"] is True
    assert rows[3]["calendar_trap"] is True
    assert rows[3]["session_param"] is True


def test_host_trap_rollup_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "http://A.io/a/b/a/b/a"),
            (2, "http://a.io/ok"),
            (3, "http://b.io/p?sid=s"),
            (4, "http://b.io/q"),
        ],
        "id long, url string",
    )
    out = {r["host"]: r for r in web.host_trap_rollup(df).collect()}
    assert out["a.io"]["n_urls"] == 2
    assert out["a.io"]["n_traps"] == 1 and out["a.io"]["n_repeat"] == 1
    assert out["a.io"]["trap_rate"] == 0.5
    assert out["b.io"]["n_session"] == 1


def _dust(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, content_hash string")
    return {r["param_key"]: r for r in web.dust_param_rules(df, **kw).collect()}


def test_dust_discovers_irrelevant_param(spark):
    rows = []
    # 4 pages; sid varies with identical content -> rule
    for page in range(4):
        for sid in ("x", "y"):
            rows.append(
                (f"http://h.io/p{page}?a=1&sid={sid}", f"content{page}")
            )
    out = _dust(spark, rows)
    sid = out["sid"]
    assert sid["n_groups"] == 4 and sid["n_consistent"] == 4
    assert sid["pairs_supported"] == 4 and sid["is_rule"]
    # 'a' is constant -> never 2 distinct values -> no row
    assert "a" not in out


def test_dust_rejects_content_selecting_param(spark):
    rows = []
    for page in range(4):
        for v in ("1", "2"):
            rows.append((f"http://h.io/p{page}?v={v}", f"c{page}:{v}"))
    out = _dust(spark, rows)
    v = out["v"]
    assert v["n_groups"] == 4 and v["n_consistent"] == 0
    assert v["precision"] == 0.0 and not v["is_rule"]


def test_dust_param_order_does_not_split_groups(spark):
    rows = [
        ("http://h.io/p?a=1&sid=x&b=2", "c"),
        ("http://h.io/p?b=2&a=1&sid=y", "c"),
        ("http://h.io/p?sid=z&b=2&a=1", "c"),
    ]
    out = _dust(spark, rows, min_support=2)
    assert out["sid"]["n_groups"] == 1
    assert out["sid"]["pairs_supported"] == 2 and out["sid"]["is_rule"]


def test_dust_support_threshold(spark):
    rows = [
        ("http://h.io/p?sid=x", "c"),
        ("http://h.io/p?sid=y", "c"),
    ]
    out = _dust(spark, rows)  # support 1 < 3
    assert out["sid"]["n_consistent"] == 1 and not out["sid"]["is_rule"]


def test_dust_ignores_queryless_and_null_urls(spark):
    rows = [
        ("http://h.io/p", "c1"),
        (None, "c2"),
        ("http://h.io/q?x=1", "c3"),
    ]
    out = _dust(spark, rows)
    assert out == {}  # x never shows 2 distinct values


def test_recrawl_lambda_golden(spark):
    import math

    # 4 visits, 1 change: lambda = -ln(3.5/4.5)
    rows = [("u", True), ("u", False), ("u", False), ("u", False)]
    df = spark.createDataFrame(rows, "url string, changed boolean")
    out = web.recrawl_change_rates(df).collect()[0]
    assert (out["n_visits"], out["n_changes"]) == (4, 1)
    assert out["lambda_x1e9"] == math.floor(-math.log(3.5 / 4.5) * 1e9)


def test_recrawl_all_changed_is_finite_and_never_changed_near_zero(spark):
    rows = [("hot", True)] * 5 + [("cold", False)] * 5
    df = spark.createDataFrame(rows, "url string, changed boolean")
    out = {r["url"]: r for r in web.recrawl_change_rates(df).collect()}
    import math

    assert out["hot"]["lambda_x1e9"] == math.floor(-math.log(0.5 / 5.5) * 1e9)
    # never-changed: (n - 0 + 0.5)/(n + 0.5) = 1 -> lambda exactly 0
    assert out["cold"]["lambda_x1e9"] == 0
    assert out["hot"]["lambda_x1e9"] > 0


def test_recrawl_null_verdict_counts_as_unchanged(spark):
    rows = [("u", True), ("u", None), ("u", False)]
    df = spark.createDataFrame(rows, "url string, changed boolean")
    out = web.recrawl_change_rates(df).collect()[0]
    # NULL is a visit with unknown verdict: counted, not changed
    assert (out["n_visits"], out["n_changes"]) == (3, 1)
    assert out["lambda_x1e9"] is not None
