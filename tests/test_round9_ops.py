"""Round-9 operators: ordered funnel, weekly cohort retention, gap-filled
time buckets with LOCF, SymSpell edit-distance-1 typo pairs."""

from __future__ import annotations

import datetime as dt

from week5_datingnlp_big_data_spark.operators import fuzzy, relational

SCHEMA = "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, dt.datetime(2024, 1, d, h), et, float(v))
            for i, (u, d, h, et, v) in enumerate(rows)
        ],
        SCHEMA,
    )


# ----------------------------------------------------------------- funnel


def test_funnel_order_matters(spark):
    rows = [
        # user 1: full ordered funnel
        (1, 1, 0, "signup", 0), (1, 1, 1, "view", 0), (1, 1, 2, "purchase", 0),
        # user 2: purchase BEFORE signup, then view — converts to view only
        (2, 1, 0, "purchase", 0), (2, 1, 1, "signup", 0), (2, 1, 2, "view", 0),
        # user 3: never signs up — invisible to every step
        (3, 1, 0, "view", 0), (3, 1, 1, "purchase", 0),
        # user 4: signup only
        (4, 1, 5, "signup", 0),
    ]
    out = {
        r["step"]: r
        for r in relational.funnel_conversion(
            _ev(spark, rows), steps=("signup", "view", "purchase")
        ).collect()
    }
    assert out["signup"]["n_users"] == 3
    assert out["view"]["n_users"] == 2
    assert out["purchase"]["n_users"] == 1
    assert out["signup"]["conv_from_prev"] == 1.0
    assert out["view"]["conv_from_prev"] == round(2 / 3, 6)
    assert out["purchase"]["conv_from_prev"] == 0.5
    assert out["purchase"]["conv_from_first"] == round(1 / 3, 6)
    assert out["signup"]["conv_from_first"] == 1.0


def test_funnel_strict_inequality_same_ts(spark):
    # A view at the EXACT signup timestamp does not convert (strict >).
    rows = [(1, 1, 0, "signup", 0), (1, 1, 0, "view", 0)]
    out = {
        r["step"]: r["n_users"]
        for r in relational.funnel_conversion(
            _ev(spark, rows), steps=("signup", "view")
        ).collect()
    }
    assert out == {"signup": 1, "view": 0}


def test_funnel_empty_upstream_gives_zero_rates(spark):
    # Rates are TOTAL: an empty upstream stage converts at 0.0 — never
    # NULL, which would poison sorted-tuple value compares downstream.
    rows = [(1, 1, 0, "view", 0)]
    out = {
        r["step"]: r
        for r in relational.funnel_conversion(
            _ev(spark, rows), steps=("signup", "view")
        ).collect()
    }
    assert out["signup"]["n_users"] == 0
    assert out["signup"]["conv_from_first"] == 0.0
    assert out["view"]["conv_from_prev"] == 0.0


# ----------------------------------------------------------------- cohort


def test_cohort_retention_matrix(spark):
    # 2024-01-01 is a Monday: days 1-7 are week 0, 8-14 week 1, 15-21 week 2.
    rows = [
        # cohort week0: users 1,2 start in week 0
        (1, 1, 0, "click", 0), (1, 8, 0, "click", 0), (1, 15, 0, "click", 0),
        (2, 2, 0, "click", 0), (2, 16, 0, "click", 0),
        # cohort week1: user 3
        (3, 9, 0, "click", 0), (3, 15, 0, "click", 0),
    ]
    got = {
        (r["cohort_week"].day, r["week_offset"]): (r["n_active"], r["retention"])
        for r in relational.cohort_retention(_ev(spark, rows)).collect()
    }
    # cohort of Jan 1: size 2; week1 has only user 1; week2 has both.
    assert got[(1, 0)] == (2, 1.0)
    assert got[(1, 1)] == (1, 0.5)
    assert got[(1, 2)] == (2, 1.0)
    # cohort of Jan 8: size 1, retained in its week 1.
    assert got[(8, 0)] == (1, 1.0)
    assert got[(8, 1)] == (1, 1.0)
    assert len(got) == 5


def test_cohort_multiple_events_count_once(spark):
    rows = [(1, 1, 0, "click", 0), (1, 1, 5, "view", 0), (1, 2, 0, "click", 0)]
    got = relational.cohort_retention(_ev(spark, rows)).collect()
    assert len(got) == 1
    assert (got[0]["week_offset"], got[0]["n_active"]) == (0, 1)


# ---------------------------------------------------------------- gapfill


def test_gapfill_locf_fills_missing_hours(spark):
    rows = [
        (1, 1, 0, "click", 10.0),
        (1, 1, 1, "click", 20.5),
        # hour 2 missing
        (1, 1, 3, "click", 7.25),
    ]
    out = {
        r["hour"].hour: r
        for r in relational.time_bucket_gapfill(_ev(spark, rows)).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    gap = out[2]
    assert gap["n_events"] == 0
    assert gap["sum_value"] is None
    assert gap["filled_value"] == 20.5
    assert gap["is_gap"] is True
    real = out[3]
    assert (real["n_events"], real["sum_value"], real["is_gap"]) == (1, 7.25, False)
    assert out[0]["filled_value"] == 10.0


def test_gapfill_axis_is_per_group(spark):
    # group 'b' spans a different window than 'a'; axes must not leak.
    rows = [
        (1, 1, 0, "a", 1.0), (1, 1, 2, "a", 1.0),
        (2, 1, 5, "b", 1.0),
    ]
    out = relational.time_bucket_gapfill(_ev(spark, rows)).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["event_type"], []).append(r["hour"].hour)
    assert sorted(by_group["a"]) == [0, 1, 2]
    assert by_group["b"] == [5]


# ------------------------------------------------------------ typo pairs


def _wf(spark, rows):
    return spark.createDataFrame(rows, "word string, n bigint")


def test_typo_pairs_substitution_insertion_deletion(spark):
    rows = [
        ("hello", 100), ("hullo", 3),    # substitution
        ("world", 80), ("worlds", 2),    # insertion
        ("there", 60), ("tere", 1),      # deletion
        ("apple", 50), ("grape", 40),    # distance > 1: never a pair
    ]
    got = {
        (r["typo"], r["canon"]): (r["typo_n"], r["canon_n"])
        for r in fuzzy.edit1_typo_pairs(_wf(spark, rows)).collect()
    }
    assert got == {
        ("hullo", "hello"): (3, 100),
        ("worlds", "world"): (2, 80),
        ("tere", "there"): (1, 60),
    }


def test_typo_pairs_frequency_gate(spark):
    rows = [
        ("might", 50), ("night", 40),   # both frequent: legitimate neighbors
        ("might2", 0), ("spark", 8), ("spurk", 3),  # ratio 8/3 < 4: kept out
    ]
    out = fuzzy.edit1_typo_pairs(_wf(spark, [r for r in rows if r[1] > 0]))
    assert out.collect() == []


def test_typo_pairs_min_length_floor(spark):
    # 3-char words are below the default min_len=4 — dense buckets and
    # mostly-legitimate neighbors, excluded wholesale.
    rows = [("cat", 100), ("cot", 1)]
    assert fuzzy.edit1_typo_pairs(_wf(spark, rows)).collect() == []


def test_typo_pairs_exact_distance1_recall(spark):
    # Blocking is exact for distance 1: every (w, w-with-one-edit) pair
    # must surface regardless of where the edit lands.
    base = "spelling"
    variants = [
        "spellings",      # append
        "spellin",        # delete last
        "spellinc",       # substitute last
        "zpelling",       # substitute first
        "sppelling",      # insert middle
    ]
    rows = [(base, 1000)] + [(v, 1) for v in variants]
    got = {r["typo"] for r in fuzzy.edit1_typo_pairs(_wf(spark, rows)).collect()}
    assert got == set(variants)


# ------------------------------------------------------- sweep-line


def _iv(spark, rows):
    return spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, h1, m1), dt.datetime(2024, 1, 1, h2, m2))
            for h1, m1, h2, m2 in rows
        ],
        "session_start timestamp, session_end timestamp",
    )


def test_concurrency_overlap_counting(spark):
    rows = [
        (0, 0, 0, 30),   # A: 00:00-00:30
        (0, 10, 0, 50),  # B: 00:10-00:50 (overlaps A)
        (0, 20, 1, 10),  # C: 00:20-01:10 (overlaps A+B, spans into hour 1)
        (2, 0, 2, 5),    # D: isolated in hour 2
    ]
    got = {
        r["hour"].hour: r["max_concurrent"]
        for r in relational.interval_concurrency(_iv(spark, rows)).collect()
    }
    assert got[0] == 3          # A+B+C all open at 00:20-00:30
    assert got[1] == 0          # only C's close boundary lives in hour 1
    assert got[2] == 1


def test_concurrency_touching_endpoints_overlap(spark):
    # end is INCLUSIVE: an interval ending at t and one starting at t overlap.
    rows = [(0, 0, 0, 30), (0, 30, 0, 45)]
    got = {
        r["hour"].hour: r["max_concurrent"]
        for r in relational.interval_concurrency(_iv(spark, rows)).collect()
    }
    assert got[0] == 2


def test_concurrency_matches_naive_global_walk(spark):
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        s = rng.randrange(0, 6 * 60)
        e = s + rng.randrange(0, 90)
        rows.append((s // 60, s % 60, e // 60, e % 60))
    got = {
        r["hour"]: r["max_concurrent"]
        for r in relational.interval_concurrency(_iv(spark, rows)).collect()
    }
    # naive single-stream reference walk
    bounds = []
    for h1, m1, h2, m2 in rows:
        bounds.append((dt.datetime(2024, 1, 1, h1, m1), 1))
        bounds.append(
            (dt.datetime(2024, 1, 1, h2, m2) + dt.timedelta(microseconds=1), -1)
        )
    bounds.sort(key=lambda x: (x[0], -x[1]))
    run, best = 0, {}
    for ts, d in bounds:
        run += d
        hour = ts.replace(minute=0, second=0, microsecond=0)
        best[hour] = max(best.get(hour, run), run)
    assert got == best


# ---------------------------------------------- interval overlap join


def test_interval_overlap_exactly_once_across_buckets(spark):
    # left interval spans many buckets; right overlaps it in several —
    # the meet rule must still emit each pair exactly once.
    L = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 6, 0))],
        "lid bigint, ls timestamp, le timestamp",
    )
    R = spark.createDataFrame(
        [
            (10, dt.datetime(2024, 1, 1, 1, 0), dt.datetime(2024, 1, 1, 5, 0)),
            (11, dt.datetime(2023, 12, 31, 23, 0), dt.datetime(2024, 1, 1, 0, 30)),
            (12, dt.datetime(2024, 1, 1, 6, 0), dt.datetime(2024, 1, 1, 7, 0)),  # touches at le: half-open, no overlap
            (13, dt.datetime(2024, 1, 1, 5, 59), dt.datetime(2024, 1, 1, 9, 0)),
        ],
        "rid bigint, rs timestamp, re timestamp",
    )
    out = relational.interval_overlap_join(
        L, R, "ls", "le", "rs", "re", bucket_micros=3600 * 1_000_000
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in out)
    assert got == [(1, 10), (1, 11), (1, 13)]


def test_interval_overlap_matches_naive_cross(spark):
    import random

    rng = random.Random(3)
    lrows = []
    rrows = []
    for i in range(80):
        s = rng.randrange(0, 500)
        lrows.append((i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s),
                      dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s + rng.randrange(1, 120))))
    for j in range(60):
        s = rng.randrange(0, 500)
        rrows.append((j, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s),
                      dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s + rng.randrange(1, 45))))
    L = spark.createDataFrame(lrows, "lid bigint, ls timestamp, le timestamp")
    R = spark.createDataFrame(rrows, "rid bigint, rs timestamp, re timestamp")
    out = relational.interval_overlap_join(
        L, R, "ls", "le", "rs", "re", bucket_micros=17 * 60 * 1_000_000
    ).collect()
    got = sorted((r["lid"], r["rid"]) for r in out)
    want = sorted(
        (li, rj)
        for li, ls, le in lrows
        for rj, rs, re in rrows
        if ls < re and rs < le
    )
    assert got == want


# -------------------------------------------------- contingency cells


def test_contingency_cells_golden(spark):
    rows = [("en", "a")] * 30 + [("en", "b")] * 10 + [("fr", "a")] * 10 + [("fr", "b")] * 50
    df = spark.createDataFrame(rows, "lang string, source string")
    got = {
        (r["row_key"], r["col_key"]): r
        for r in relational.contingency_cells(df, "lang", "source").collect()
    }
    # margins: en=40, fr=60, a=40, b=60, n=100
    assert got[("en", "a")]["observed"] == 30
    assert got[("en", "a")]["expected"] == 16.0
    assert got[("en", "a")]["chi2_contrib"] == round((30 - 16.0) ** 2 / 16.0, 6)
    assert got[("fr", "b")]["expected"] == 36.0
    assert got[("fr", "b")]["chi2_contrib"] == round((50 - 36.0) ** 2 / 36.0, 6)
    assert len(got) == 4


# -------------------------------------------------------------- SCD2


def test_scd2_islands_and_chaining(spark):
    rows = [
        (1, 1, 0, "view", 0), (1, 1, 1, "view", 0),      # island 1: view x2
        (1, 1, 2, "purchase", 0),                         # island 2
        (1, 1, 3, "view", 0),                             # island 3 (view returns)
        (2, 1, 0, "click", 0),                            # other user
    ]
    out = relational.scd2_from_events(_ev(spark, rows))
    got = sorted(
        (r["user_id"], r["version"], r["state"], r["n_events"],
         r["eff_start"].hour, None if r["eff_end"] is None else r["eff_end"].hour)
        for r in out.collect()
    )
    assert got == [
        (1, 1, "view", 2, 0, 2),
        (1, 2, "purchase", 1, 2, 3),
        (1, 3, "view", 1, 3, None),
        (2, 1, "click", 1, 0, None),
    ]


def test_scd2_consecutive_null_states_merge(spark):
    import datetime as _dt

    rows = [
        (0, 1, _dt.datetime(2024, 1, 1, 0), None, 0.0),
        (1, 1, _dt.datetime(2024, 1, 1, 1), None, 0.0),
        (2, 1, _dt.datetime(2024, 1, 1, 2), "view", 0.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = relational.scd2_from_events(df).collect()
    states = sorted((r["version"], r["state"], r["n_events"]) for r in out)
    assert states == [(1, None, 2), (2, "view", 1)]


# --------------------------------------------------------------- trend


def test_group_trend_exact_line(spark):
    # y = 3x + 7 exactly: slope/intercept recover the line.
    rows = [("a", x, 3 * x + 7) for x in range(10, 16)]
    rows += [("b", 5, 100)]  # degenerate: single x → NULL fit
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {r["g"]: r for r in relational.group_trend(df, "g", "x", "y").collect()}
    assert got["a"]["slope"] == 3.0
    # x re-based to the group min (10): intercept = fitted y at x=10
    assert got["a"]["intercept"] == 37.0
    assert got["b"]["slope"] is None and got["b"]["intercept"] is None
    assert got["a"]["n_points"] == 6


def test_group_trend_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    xs = np.arange(30)
    ys = (5 * xs + rng.randint(0, 50, 30)).astype(int)
    df = spark.createDataFrame(
        [("g", int(x), int(y)) for x, y in zip(xs, ys)],
        "g string, x bigint, y bigint",
    )
    got = relational.group_trend(df, "g", "x", "y").collect()[0]
    slope, icept = np.polyfit(xs, ys, 1)
    assert abs(got["slope"] - slope) < 1e-6
    assert abs(got["intercept"] - icept) < 1e-6


# --------------------------------------------------------- rollup merge


def test_daily_from_hourly_equals_direct_daily(spark):
    # Mergeable-aggregate contract: composing daily from hourly partials
    # must equal aggregating raw events directly (counts/min/max exactly;
    # sums up to the documented two-level 4-dp rounding).
    import random

    rng = random.Random(2)
    rows = [
        (i, 1, dt.datetime(2024, 1, 1 + rng.randrange(3), rng.randrange(24),
                           rng.randrange(60)),
         "click", round(rng.uniform(-50, 50), 3))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    from pyspark.sql import functions as F

    hourly = df.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    daily = hourly.groupBy("event_type", F.date_trunc("day", "hour").alias("day")).agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("sum_value"), 4).alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    direct = df.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    a = {(r["event_type"], r["day"]): r for r in daily.collect()}
    b = {(r["event_type"], r["day"]): r for r in direct.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k]["n_events"] == b[k]["n_events"]
        assert a[k]["min_value"] == b[k]["min_value"]
        assert a[k]["max_value"] == b[k]["max_value"]
        assert abs(a[k]["sum_value"] - b[k]["sum_value"]) < 24 * 1e-4


# ----------------------------------------------------------- SQ8 search


def test_sq8_topk_recall_vs_exact(spark, sf_dir):
    from week5_datingnlp_big_data_spark.operators import similarity
    from week5_datingnlp_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qids = list(range(8))
    exact = similarity.cosine_topk(emb, qids, k=5)
    sq = similarity.sq8_cosine_topk(emb, qids, k=5)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in sq.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(ex)
    recalls = [len(ex[q] & got[q]) / len(ex[q]) for q in ex]
    # int8 keeps ~2 decimal digits of the cosine: top-5 overlap stays high
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_sq8_codes_bounds_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from week5_datingnlp_big_data_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["q"]
        for r in df.select(
            "vec_id", similarity.sq8_codes(F.col("embedding")).alias("q")
        ).collect()
    }
    assert out[1] == [64, -127, 32]     # round(0.5/ (1/127)) = 63.5 -> 64
    assert out[2] == [0, 0, 0]


# -------------------------------------------------- weighted sampling


def test_weighted_sample_determinism_and_rate(spark):
    from week5_datingnlp_big_data_spark.operators import corpus

    rows = [(i, 1.0 if i % 2 == 0 else 0.25) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    a = sorted(r["doc_id"] for r in corpus.weighted_sample(df, "w", 0.8).collect())
    b = sorted(r["doc_id"] for r in corpus.weighted_sample(df, "w", 0.8).collect())
    assert a == b                      # pure function of ids
    hi = sum(1 for i in a if i % 2 == 0) / 2000   # keep prob 0.8
    lo = sum(1 for i in a if i % 2 == 1) / 2000   # keep prob 0.2
    assert abs(hi - 0.8) < 0.05 and abs(lo - 0.2) < 0.05
    # salt change draws an independent sample
    c = sorted(r["doc_id"] for r in
               corpus.weighted_sample(df, "w", 0.8, salt="other").collect())
    assert c != a


def test_weighted_sample_null_and_clamp(spark):
    from week5_datingnlp_big_data_spark.operators import corpus

    rows = [(1, None), (2, 5.0), (3, 0.0)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = {r["doc_id"] for r in corpus.weighted_sample(df, "w", 0.8).collect()}
    assert 1 not in got       # NULL weight never passes
    assert 3 not in got       # zero weight never passes
    assert 2 in got           # clamped to certainty


# ------------------------------------------------------------ winsorize


def test_winsorize_clips_and_preserves_nulls(spark):
    rows = [(i, 1, 0, "a", float(v)) for i, v in enumerate(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    rows.append((99, 1, 0, "a", None))
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), et, v) for i, _, _, et, v in rows],
        "event_id bigint, ts timestamp, event_type string, value double",
    )
    out = {
        r["event_id"]: (r["value_w"], r["was_clipped"])
        for r in relational.winsorize(
            df.select("event_id", "event_type", "value"), "event_type", "value"
        ).collect()
    }
    assert out[99] == (None, None)                 # NULL stays NULL
    assert out[9][1] is True                       # 1000 clipped down
    assert out[9][0] < 1000
    assert out[4][1] is False                      # median untouched
    assert out[4][0] == 5.0
