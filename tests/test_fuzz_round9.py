"""Fuzz the round-9 behavioral/time-series operators against their
REGISTERED oracle SQL over hostile events: NULL users / event types /
values, exact timestamp ties, pre-epoch instants, DST boundaries, and
microsecond edges. The oracle strings come straight from the registry —
the same text the driver runs — pointed at a DuckDB view over the fuzz
frame, so any Spark↔SQL semantic gap (NULL grouping vs JOIN USING,
week-truncation conventions, floor-division on negatives) surfaces here
before the driver sees it."""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import relational
from week5_datingnlp_big_data_spark.registry import ORACLE

EDGE_MICROS = [
    0, -1, -1_000_000, -86_400_000_000, 1, 999_999, 1_000_000,
    1710054000_000_000, 1710054000_000_000 - 1, 1710054000_000_000 + 1,
    1730613600_000_000, 1709164800_000_000, 1704067199_999_999,
    1704067200_000_000,
]

TYPES = ["click", "view", "signup", "purchase", "error", None]


@pytest.fixture(scope="module")
def fuzz9(spark):
    rng = random.Random(20260814)
    rows = []
    eid = 0
    # tie cluster: same instant, several users incl. NULL, mixed types —
    # exercises the funnel's strict inequality and sessionize tiebreaks
    for user in (1, 2, None):
        for et in ("signup", "view", "purchase"):
            rows.append((eid, user, 1710054000_000_000, et, 1.0))
            eid += 1
    # ordered funnels at hostile instants (incl. pre-epoch)
    for k, base in enumerate(EDGE_MICROS):
        u = 100 + k
        rows.append((eid, u, base, "signup", 0.5)); eid += 1
        rows.append((eid, u, base + 1, "view", None)); eid += 1
        rows.append((eid, u, base + 2, "purchase", -3.25)); eid += 1
    for _ in range(600):
        um = rng.choice(
            [rng.randint(-10**8, 10**8) * 1_000_000 + rng.randint(0, 999_999),
             rng.choice(EDGE_MICROS),
             1710000000_000_000 + rng.randint(0, 7200) * 500_000]
        )
        rows.append(
            (eid, rng.choice([None, 1, 2, 3, 7, rng.randint(0, 12)]), um,
             rng.choice(TYPES), rng.choice([None, 0.0, -1.5, rng.random() * 1000]))
        )
        eid += 1
    sdf = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, um long, event_type string, value double"
        )
        .withColumn("ts", F.timestamp_micros("um"))
        .drop("um")
    )
    con = duckdb.connect()
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "um", "event_type", "value"]
    )
    con.register("raw", pdf)
    con.execute(
        """CREATE VIEW events AS
           SELECT event_id, user_id, make_timestamp(um) AS ts,
                  event_type, value FROM raw"""
    )
    return sdf.cache(), con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        return 0.0 if r == 0 else r
    return v


def _compare(sdf, con, sql):
    spdf = sdf.toPandas()
    odf = con.execute(sql).df()
    cols = sorted(spdf.columns)
    assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
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


def test_funnel_fuzz(fuzz9):
    sdf, con = fuzz9
    _compare(
        relational.funnel_conversion(sdf, steps=("signup", "view", "purchase")),
        con,
        ORACLE["funnel_conversion"],
    )


def test_cohort_retention_fuzz(fuzz9):
    sdf, con = fuzz9
    _compare(relational.cohort_retention(sdf), con, ORACLE["cohort_retention"])


def test_gapfill_locf_fuzz(fuzz9):
    sdf, con = fuzz9
    _compare(
        relational.time_bucket_gapfill(sdf), con, ORACLE["events_gapfill_locf"]
    )


def test_session_concurrency_fuzz(fuzz9):
    sdf, con = fuzz9
    sess = relational.session_stats(sdf, gap_minutes=30.0)
    _compare(
        relational.interval_concurrency(sess),
        con,
        ORACLE["session_concurrency"],
    )


def test_session_error_exposure_fuzz(fuzz9):
    sdf, con = fuzz9
    sess = relational.session_stats(sdf, gap_minutes=30.0).select(
        "user_id", "session_seq", "session_start",
        F.timestamp_micros(F.unix_micros("session_end") + 1).alias("session_end_x"),
    )
    inc = sdf.filter(F.col("event_type") == "error").select(
        (F.col("ts") - F.expr("interval 5 minutes")).alias("inc_start"),
        (F.col("ts") + F.expr("interval 5 minutes")).alias("inc_end"),
    )
    pairs = relational.interval_overlap_join(
        sess, inc, "session_start", "session_end_x", "inc_start", "inc_end",
        bucket_micros=10 * 60 * 1_000_000,
    )
    got = pairs.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_incidents")
    )
    _compare(got, con, ORACLE["session_error_exposure"])


def test_session_window_native_fuzz(fuzz9):
    sdf, con = fuzz9
    got = (
        sdf.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    _compare(got, con, ORACLE["events_session_window_native"])


def test_user_state_scd2_fuzz(fuzz9):
    sdf, con = fuzz9
    got = relational.scd2_from_events(sdf.filter(F.col("user_id").isNotNull()))
    _compare(got, con, ORACLE["user_state_scd2"])


def test_copurchase_fuzz_vs_oracle(spark):
    """Random baskets (skewed sizes, duplicate lines, one mega-basket
    beyond the guard) through the REGISTERED market-basket oracle."""
    rng = random.Random(20260815)
    rows = []
    for basket in range(300):
        size = rng.choice([1, 1, 2, 2, 3, 4, 5, 8])
        items = [rng.randrange(40) for _ in range(size)]
        items += items[: rng.randrange(0, 2)]        # duplicate lines
        rows += [(basket, it) for it in items]
    rows += [(9999, it) for it in range(150)]        # mega-basket: dropped
    sdf = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    con = duckdb.connect()
    con.register("raw_li", pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"]))
    con.execute("CREATE VIEW lineitem AS SELECT * FROM raw_li")
    got = relational.basket_copurchase(
        sdf, "l_orderkey", "l_partkey", min_support=3, max_basket_size=100
    )
    _compare(got, con, ORACLE["part_copurchase_pairs"])


@pytest.fixture(scope="module")
def fuzz_docs(spark):
    """Adversarial documents for the text-graph/typo fuzz: repeated
    phrases (so edges clear min_weight), near-identical words (typo
    fodder), unicode, empties, NULLs."""
    rng = random.Random(20260816)
    words = ["spark", "spork", "sparks", "engine", "enginee", "data",
             "big", "scale", "shuffle", "shuffl", "join", "joins",
             "中文", "naïve", "don't", "x"]
    # source tags carry their own edit-1 variants (and a NULL) — the
    # registered vocab_typo_pairs vocabulary is tokens UNION source tags
    sources = ["webA", "webB", "web", None, "crawl1", "crawl2"]
    rows = []
    for i in range(250):
        n = rng.randint(0, 25)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n)),
                     rng.choice(sources)))
    rows += [(1000, "", "webA"), (1001, None, None), (1002, "   ", "web"),
             (1003, "spark engine " * 30, "crawl1"),
             (1004, "<p>spark&amp;engine</p>", "crawl2")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string, source string")
    con = duckdb.connect()
    con.register("raw_docs", pd.DataFrame(rows, columns=["doc_id", "text", "source"]))
    con.execute("CREATE VIEW documents AS SELECT * FROM raw_docs")
    return sdf.cache(), con


def test_textrank_fuzz_vs_oracle(fuzz_docs):
    from week5_datingnlp_big_data_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )
    from week5_datingnlp_big_data_spark.operators import graph
    from week5_datingnlp_big_data_spark.operators.corpus import clean_text
    from week5_datingnlp_big_data_spark.session import spread

    sdf, con = fuzz_docs
    toks = spread(sdf.filter(F.length(F.col("text")) > 0)).select(
        remove_stopwords(tokenize(clean_text("text"))).alias("tokens")
    )
    got = graph.textrank_keywords(toks, k=50)
    _compare(got, con, ORACLE["textrank_keywords"])


def test_typo_pairs_fuzz_vs_oracle(fuzz_docs):
    from week5_datingnlp_big_data_spark.functions.text import (
        remove_stopwords,
        tokenize,
    )
    from week5_datingnlp_big_data_spark.operators import fuzzy
    from week5_datingnlp_big_data_spark.operators.corpus import (
        clean_text,
        explode_tokens,
    )
    from week5_datingnlp_big_data_spark.session import spread

    sdf, con = fuzz_docs
    toks = spread(sdf.filter(F.length(F.col("text")) > 0)).select(
        "doc_id",
        remove_stopwords(tokenize(clean_text("text"))).alias("tokens"),
    )
    words = (
        explode_tokens(toks, "tokens", "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # mirror the REGISTERED form: vocabulary = tokens UNION source tags,
    # asymmetry gate open (the production gate stays the operator default,
    # pinned by test_round9_ops)
    srcs = (
        sdf.filter(F.col("source").isNotNull())
        .groupBy(F.col("source").alias("word"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = words.unionByName(srcs).groupBy("word").agg(F.sum("n").alias("n"))
    got = fuzzy.edit1_typo_pairs(wf, freq_ratio=1, min_canon_freq=1)
    _compare(got, con, ORACLE["vocab_typo_pairs"])
