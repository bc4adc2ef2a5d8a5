"""Robust daily-volume anomaly detection (relational.daily_count_anomalies):
weekday-cohort median/MAD z-scores must flag a planted outage and stay
silent on constant and mildly-noisy feeds."""

from __future__ import annotations

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import relational


def _events(spark, day_counts):
    rows = []
    eid = 0
    for day, n in day_counts.items():
        for _ in range(n):
            rows.append((eid, f"{day} 12:00:00"))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts string").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts")
    )


def test_planted_outage_flags_only_itself(spark):
    # four weeks of steady Mondays + one outage Monday at 10% volume
    mondays = ["2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22",
               "2024-01-29"]
    counts = {d: 100 + i for i, d in enumerate(mondays[:4])}
    counts[mondays[4]] = 10  # the outage
    out = {
        r["day"]: r
        for r in relational.daily_count_anomalies(
            _events(spark, counts)
        ).collect()
    }
    assert out["2024-01-29"]["is_anomaly"]
    assert not any(out[d]["is_anomaly"] for d in mondays[:4])
    # all five share one weekday cohort
    assert len({r["wd"] for r in out.values()}) == 1


def test_constant_feed_never_flags(spark):
    days = [f"2024-02-{d:02d}" for d in range(1, 29)]
    out = relational.daily_count_anomalies(
        _events(spark, {d: 50 for d in days})
    ).collect()
    assert len(out) == 28
    # MAD = 0 cohorts report z = 0, never anomalous
    assert all(r["z"] == 0.0 and not r["is_anomaly"] for r in out)


def test_weekday_index_is_epoch_mod7(spark):
    out = relational.daily_count_anomalies(
        _events(spark, {"1970-01-01": 3, "1970-01-08": 4})
    ).collect()
    assert all(r["wd"] == 0 for r in out)  # epoch day 0 and 7


def test_session_paths_orders_and_ranks(spark):
    rows = [
        # user 1: one session view>click>buy
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "buy"),
        # user 2: same path
        (4, 2, "2024-01-01 11:00:00", "view"),
        (5, 2, "2024-01-01 11:01:00", "click"),
        (6, 2, "2024-01-01 11:02:00", "buy"),
        # user 1 again, NEW session (gap > 30 min): view only
        (7, 1, "2024-01-01 12:00:00", "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type")
    out = {r["path"]: r for r in relational.session_paths(ev).collect()}
    assert out["view>click>buy"]["n_sessions"] == 2
    assert out["view>click>buy"]["n_users"] == 2
    assert out["view>click>buy"]["rank"] == 1
    assert out["view"]["n_sessions"] == 1 and out["view"]["n_users"] == 1


def test_session_paths_truncates_at_max_steps(spark):
    rows = [
        (i, 1, f"2024-01-01 10:{i:02d}:00", f"e{i}") for i in range(8)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type")
    out = relational.session_paths(ev, max_steps=3).collect()
    assert len(out) == 1 and out[0]["path"] == "e0>e1>e2"


def test_script_stats_classifies_mixed_text(spark):
    from week5_datingnlp_big_data_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, "你好世界"),          # 你好世界
            (2, "abc 中文 123 Да"),  # latin+cjk+digit+cyrillic
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.script_stats(docs).collect()}
    assert out[0]["n_latin"] == 10 and out[0]["n_cjk"] == 0
    assert not out[0]["cjk_dominant"]
    assert out[1]["n_cjk"] == 4 and out[1]["cjk_frac"] == 1.0
    assert out[1]["cjk_dominant"]
    assert out[2]["n_latin"] == 3 and out[2]["n_cjk"] == 2
    assert out[2]["n_digit"] == 3 and out[2]["n_cyrillic"] == 2
    assert out[3]["n_chars"] == 0 and out[3]["latin_frac"] == 0.0


def test_attribution_rules_and_conservation(spark):
    rows = [
        # user 1: three touches inside the window, purchase of 12.0
        (1, 1, "2024-01-02 11:00:00", "view", 0.0),
        (2, 1, "2024-01-02 11:30:00", "click", 0.0),
        (3, 1, "2024-01-02 11:45:00", "view", 0.0),
        (4, 1, "2024-01-02 12:00:00", "purchase", 12.0),
        # user 2: purchase with NO touches
        (5, 2, "2024-01-02 12:00:00", "purchase", 7.0),
        # user 3: only touch is OUTSIDE the 24h lookback
        (6, 3, "2024-01-01 11:00:00", "view", 0.0),
        (7, 3, "2024-01-02 12:00:00", "purchase", 5.0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts string, event_type string, value double",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type", "value")
    out = relational.attribution_credits(ev, lookback_hours=24).collect()
    by = {}
    for r in out:
        by[(r["conv_id"], r["scheme"], r["touch_type"])] = r
    # linear: 2 views of 3 touches -> 8.0; 1 click -> 4.0
    assert by[(4, "linear", "view")]["credit"] == 8.0
    assert by[(4, "linear", "view")]["n_touches"] == 2
    assert by[(4, "linear", "click")]["credit"] == 4.0
    # first touch was the 11:00 view; last the 11:45 view
    assert by[(4, "first", "view")]["credit"] == 12.0
    assert by[(4, "last", "view")]["credit"] == 12.0
    # users 2 and 3 are unattributed (no touch / stale touch)
    assert by[(5, "unattributed", "none")]["credit"] == 7.0
    assert by[(7, "unattributed", "none")]["credit"] == 5.0
    # conservation: every scheme's credits sum to total purchase value
    total = 12.0 + 7.0 + 5.0
    for scheme in ("linear", "first", "last"):
        s = sum(
            r["credit"] for r in out
            if r["scheme"] in (scheme, "unattributed")
        )
        assert abs(s - total) < 1e-6, scheme
