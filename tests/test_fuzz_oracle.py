"""Fuzz the Spark↔DuckDB oracle equivalence on the text layer: hundreds of
adversarial strings (unicode, quotes, regex metachars, HTML fragments,
whitespace runs, stop words) through BOTH implementations of the tokenizer
and the cleaning chain. Any Java-regex vs RE2 divergence shows up here
before the driver's correctness gate sees it."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators.corpus import clean_text
from week5_datingnlp_big_data_spark.functions.text import remove_stopwords, tokenize
from week5_datingnlp_big_data_spark.registry import _sql_tokens

ALPHABET = (
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
    + list(".,;:!?()[]{}<>#$%^&*-_'\"/\\|`~+= \t\n")
    + ["’", "é", "ü", "中", "文", "∂", "😀"]
    + ["<br />", "</p>", "&amp;", "<a href=\"x\">", "class=\"y\"", "\\n"]
    + ["the", "and", "i'm", "love", "don't", "a", "i", "mid-century", "  ", "   "]
)


def _gen(rng: random.Random) -> str:
    n = rng.randint(0, 30)
    return "".join(
        rng.choice(ALPHABET) + ("" if rng.random() < 0.6 else " ") for _ in range(n)
    )


@pytest.fixture(scope="module")
def fuzz_rows():
    rng = random.Random(20260813)
    rows = [(i, _gen(rng)) for i in range(400)]
    # targeted nasties
    rows += [
        (1000, ""),
        (1001, " "),
        (1002, "a  b   c"),
        (1003, "'''"),
        (1004, "---word--- 'quoted' -x-"),
        (1005, "<a href=\"http://x\">link</a>&amp;<br />done"),
        (1006, "i'm the a an and as at are"),
        (1007, "ALL CAPS And MiXeD"),
        (1008, "tab\there\nnewline"),
        (1009, "数字123と文字"),
    ]
    return rows


def test_tokenizer_matches_oracle_on_fuzz(spark, fuzz_rows):
    df = spark.createDataFrame(fuzz_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["toks"] or [])
        for r in df.select(
            "doc_id", remove_stopwords(tokenize(clean_text("text"))).alias("toks")
        ).collect()
    }

    con = duckdb.connect()
    pdf = pd.DataFrame(fuzz_rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    expr = _sql_tokens("text", clean=True, stop=True)
    odf = con.execute(f"SELECT doc_id, {expr} AS toks FROM documents").df()
    want = {int(r.doc_id): list(r.toks) for r in odf.itertuples(index=False)}

    mismatches = {
        k: (got[k], want[k]) for k in got if got[k] != want[k]
    }
    assert not mismatches, f"{len(mismatches)} divergent inputs, e.g.: " + str(
        list(mismatches.items())[:3]
    )


def test_token_counts_match_oracle_on_fuzz(spark, fuzz_rows):
    from week5_datingnlp_big_data_spark.operators import textstats

    df = spark.createDataFrame(fuzz_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            textstats.token_count_ws("text").alias("ws"),
            textstats.token_count_bpe_ish("text").alias("bpe"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(fuzz_rows, columns=["doc_id", "text"]))
    odf = con.execute(
        """
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]')) AS bpe
        FROM documents
        """
    ).df()
    want = {int(r.doc_id): (int(r.ws), int(r.bpe)) for r in odf.itertuples(index=False)}
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, list(bad.items())[:3]


def test_sentence_count_matches_oracle_on_fuzz(spark, fuzz_rows):
    df = spark.createDataFrame(fuzz_rows, "doc_id long, text string")
    segs = F.split("text", "[.!?]+")
    n = F.size(F.filter(segs, lambda s: F.length(F.trim(s)) > 0))
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", n.alias("n")).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(fuzz_rows, columns=["doc_id", "text"]))
    odf = con.execute(
        """SELECT doc_id, len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                              s -> length(trim(s)) > 0)) AS n FROM documents"""
    ).df()
    want = {int(r.doc_id): int(r.n) for r in odf.itertuples(index=False)}
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, list(bad.items())[:3]


def test_raw_split_matches_oracle_on_fuzz(spark, fuzz_rows):
    df = spark.createDataFrame(fuzz_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: list(r["w"] or [])
        for r in df.select("doc_id", F.split("text", " ", -1).alias("w")).collect()
    }
    con = duckdb.connect()
    pdf = pd.DataFrame(fuzz_rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    odf = con.execute("SELECT doc_id, string_split(text, ' ') AS w FROM documents").df()
    want = {int(r.doc_id): list(r.w) for r in odf.itertuples(index=False)}
    assert got == want
