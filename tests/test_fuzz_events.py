"""Fuzz the Spark↔DuckDB oracle equivalence on the EVENTS surface:
adversarial timestamps (epoch 0, pre-1970, DST transition instants,
microsecond edges, exact ties), NULL user_ids, and hostile-but-valid JSON
props, through the same expression logic the registered events queries
use. Complements test_fuzz_oracle.py, which covers the text layer.

Timestamps travel as integer epoch-micros and materialize via
timestamp_micros / make_timestamp on each side — no string parsing, no
session-timezone dependence in the fixture itself."""

from __future__ import annotations

import json
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

# Instants chosen to be hostile: epoch, pre-epoch, US DST spring-forward /
# fall-back (2024-03-10 07:00 UTC / 2024-11-03 06:00 UTC), leap day,
# year boundaries, and sub-second edges.
EDGE_MICROS = [
    0,
    -1,
    -1_000_000,
    -86_400_000_000,                    # 1969-12-31
    1,
    999_999,
    1_000_000,
    1710054000_000_000,                 # 2024-03-10 07:00:00 UTC (DST jump)
    1710054000_000_000 - 1,
    1710054000_000_000 + 1,
    1730613600_000_000,                 # 2024-11-03 06:00:00 UTC (fall back)
    1730613600_000_000 - 1,
    1709164800_000_000,                 # 2024-02-29 (leap day)
    1704067199_999_999,                 # 2023-12-31 23:59:59.999999
    1704067200_000_000,                 # 2024-01-01 00:00:00
]

PROPS_POOL = [
    None,
    "{}",
    '{"k": 0}',
    '{"k": 51}',
    '{"k": -7}',
    '{"k": 9223372036854775807}',
    '{"k": "99"}',
    '{"k": "0051"}',
    '{"k": 51.5}',
    '{"k": "51.5"}',
    '{"k": 1000.0}',
    '{"k": "6e2"}',
    '{"k": null}',
    '{"j": 1}',
    '{"k": 12, "j": "x"}',
    '{"nested": {"k": 5}}',
    "null",
    '{"k": ""}',
]

EVENT_TYPES = ["click", "view", "signup", "purchase", None]


@pytest.fixture(scope="module")
def fuzz_events():
    rng = random.Random(20260813)
    rows = []
    eid = 0
    for um in EDGE_MICROS:
        for user in (1, None):
            rows.append((eid, user, um, "click", 1.0, '{"k": 60}'))
            eid += 1
    # exact-tie cluster: several users with duplicated timestamps so the
    # sessionize/lag tiebreak (ts, event_id) is actually exercised
    for user in (7, 8, None):
        for um in (1710054000_000_000, 1710054000_000_000, 1710055800_000_000):
            rows.append((eid, user, um, "view", 2.5, '{"k": 1}'))
            eid += 1
    for _ in range(400):
        um = rng.choice(
            [rng.randint(-10**8, 10**8) * 1_000_000 + rng.randint(0, 999_999),
             rng.choice(EDGE_MICROS),
             1710000000_000_000 + rng.randint(0, 3600) * 1_000_000]
        )
        user = rng.choice([None, 1, 2, 3, 7, rng.randint(0, 5)])
        props = rng.choice(
            PROPS_POOL + [json.dumps({"k": rng.randint(-100, 100)})]
        )
        # magnitudes stay ≤1e6: at ~1e15 the ulp (0.125) times a few adds
        # exceeds the 4-dp rounding window and float sum order alone
        # diverges — not an engine defect, just float physics
        value = rng.choice([None, 0.0, -1.5, rng.random() * 1000, 1e6])
        rows.append((eid, user, um, rng.choice(EVENT_TYPES), value, props))
        eid += 1
    return rows


@pytest.fixture(scope="module")
def sides(spark, fuzz_events):
    sdf = (
        spark.createDataFrame(
            fuzz_events,
            "event_id long, user_id long, um long, event_type string, "
            "value double, props string",
        )
        .withColumn("ts", F.timestamp_micros("um"))
        .drop("um")
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(
        fuzz_events,
        columns=["event_id", "user_id", "um", "event_type", "value", "props"],
    )
    con.register("raw", pdf)
    con.execute(
        """CREATE VIEW events AS
           SELECT event_id, user_id, make_timestamp(um) AS ts,
                  event_type, value, props
           FROM raw"""
    )
    return sdf.cache(), con


def _norm(v):
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r  # fold -0.0
    return v


def _compare(sdf, con, sql):
    spdf = sdf.toPandas()
    odf = con.execute(sql).df()
    cols = sorted(spdf.columns)
    assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
    # sort by repr: row tuples mix None/str/float/timestamp, which plain
    # tuple ordering cannot compare; equal rows have equal reprs.
    got = sorted(
        (tuple(_norm(v) for v in r) for r in spdf[cols].itertuples(index=False)),
        key=repr,
    )
    want = sorted(
        (tuple(_norm(v) for v in r) for r in odf[cols].itertuples(index=False)),
        key=repr,
    )
    assert got == want, (
        f"{sum(1 for a, b in zip(got, want) if a != b)} divergent rows, e.g. "
        + str([(a, b) for a, b in zip(got, want) if a != b][:3])
    )


def test_events_hourly_fuzz(sides):
    sdf, con = sides
    got = sdf.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    _compare(
        got,
        con,
        """SELECT date_trunc('hour', ts) AS hour, event_type,
                  count(*) AS n_events, round(sum(value), 4) AS sum_value,
                  round(avg(value), 6) AS avg_value
           FROM events GROUP BY 1, 2""",
    )


def test_events_json_extract_fuzz(sides):
    # Integer-regex guard on BOTH sides: the engines' bare try_cast
    # disagrees on fractional strings (DuckDB rounds '51.5' to 52, Spark
    # yields NULL) — the pinned spec casts pure-integer strings only.
    sdf, con = sides
    v = F.get_json_object("props", "$.k")
    k = F.when(v.rlike("^-?[0-9]+$"), v).try_cast("bigint")
    got = sdf.select("event_id", k.alias("k"))
    _compare(
        got,
        con,
        """SELECT event_id,
                  TRY_CAST(CASE WHEN regexp_matches(props->>'k', '^-?[0-9]+$')
                           THEN props->>'k' END AS BIGINT) AS k
           FROM events""",
    )


def test_user_event_lag_fuzz(sides):
    sdf, con = sides
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts"))
    gap = um - F.lag(um).over(w)
    got = sdf.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.coalesce(gap, F.lit(-1)).alias("gap_usec"),
    )
    _compare(
        got,
        con,
        """SELECT event_id, user_id,
                  lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    AS prev_event_id,
                  COALESCE(date_diff('microsecond',
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), -1)
                    AS gap_usec
           FROM events""",
    )


def test_events_sessionize_fuzz(sides):
    from week5_datingnlp_big_data_spark.operators import relational

    sdf, con = sides
    got = relational.session_stats(sdf, gap_minutes=30.0).withColumn(
        "span_sec", F.round("span_sec", 6)
    )
    _compare(
        got,
        con,
        """
        WITH s AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('microsecond', lag(ts) OVER w, ts) > 30*60*1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM s
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               round(date_diff('microsecond', min(ts), max(ts)) / 1000000.0, 6) AS span_sec
        FROM numbered GROUP BY user_id, session_seq
        """,
    )


def test_events_trailing_hour_fuzz(sides):
    # Time-range sliding frame across the hostile instants: exact-tie
    # clusters (all ties enter each other's frame), pre-epoch negatives,
    # DST-adjacent micros, NULL user partitions, NULL values (skipped by
    # sum on both engines). Sums as integer cents so sliding-aggregation
    # accumulation order cannot split the last ulp.
    sdf, con = sides
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    got = sdf.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.sum(cents).over(w).alias("sum_cents_1h"),
    )
    _compare(
        got,
        con,
        """SELECT event_id, user_id, ts,
                  count(*) OVER w AS n_events_1h,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
                    AS sum_cents_1h
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
    )


def test_events_range_attribution_fuzz(sides):
    # Bucketized point-in-interval range join vs DuckDB's native theta
    # range join, over the hostile timestamp pool (pre-epoch negatives
    # exercise floor-division bucketing below zero; exact ties exercise
    # the inclusive-start/exclusive-end boundary).
    from week5_datingnlp_big_data_spark.operators import relational

    sdf, con = sides
    purchases = sdf.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"),
    )
    signups = sdf.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
    )
    out = relational.range_join_point_in_interval(
        purchases, signups, key="user_id", left_point="p_ts",
        right_start="win_start", right_end="win_end",
        bucket_micros=3_600 * 1_000_000,
    ).select(
        "purchase_id", "signup_id",
        (F.unix_micros("p_ts") - F.unix_micros("win_start")).alias("micros_after"),
    )
    _compare(out, con, """
        SELECT p.event_id AS purchase_id, s.event_id AS signup_id,
               CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS micros_after
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'signup') s
          ON p.user_id = s.user_id
         AND s.ts <= p.ts AND p.ts < s.ts + INTERVAL 1 HOUR
    """)
