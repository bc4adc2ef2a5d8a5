"""Fuzz the round-4 surface: PII scrub Spark↔DuckDB equivalence on
adversarial strings with planted PII, and sequence packing vs a pure-
Python packer across random chunk tables and parameters."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from week5_datingnlp_big_data_spark import registry
from week5_datingnlp_big_data_spark.operators import corpus, textstats

PII_ALPHABET = (
    list("abcdefghijklmnopqrstuvwxyz0123456789")
    + list(".,;:!?()[]{}@+-_'\"/\\| \t\n")
    + ["@", ".com", ".co.uk", "user", "example", "10.0.0.1", "999.1.1.1",
       "+1 (555) 123-4567", "not@", "@nope", "a@b.io", "x.y@z.org",
       "1.2.3.4.5", "256.256.256.256", "+12", "++44 20 7946 0958",
       "email@", "@.com", "mail-host", "%", "_", "café@naïve.fr"]
)


def _gen_pii(rng: random.Random) -> str:
    n = rng.randint(0, 25)
    return "".join(
        rng.choice(PII_ALPHABET) + ("" if rng.random() < 0.5 else " ")
        for _ in range(n)
    )


def test_pii_scrub_matches_oracle_on_fuzz(spark):
    rng = random.Random(20260814)
    rows = [(i, _gen_pii(rng)) for i in range(300)]
    rows += [(900, ""), (901, None), (902, "@@@"), (903, "1.2.3.4"),
             (904, "a@b.c"), (905, "+--+"), (906, "a@b.io.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["redacted"])
        for r in textstats.pii_scrub(df).collect()
    }

    con = duckdb.connect()
    con.register("d", pd.DataFrame(rows, columns=["doc_id", "text"]))
    pats = {k: v.replace("'", "''") for k, v in textstats.PII_PATTERNS.items()}
    odf = con.execute(f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{pats["email"]}')) AS n_email,
               len(regexp_extract_all(text, '{pats["ipv4"]}')) AS n_ipv4,
               len(regexp_extract_all(text, '{pats["phone"]}')) AS n_phone,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{pats["email"]}', '<EMAIL>', 'g'),
                   '{pats["ipv4"]}', '<IPV4>', 'g'),
                   '{pats["phone"]}', '<PHONE>', 'g') AS redacted
        FROM d WHERE text IS NOT NULL
    """).df()
    want = {
        int(r.doc_id): (int(r.n_email), int(r.n_ipv4), int(r.n_phone), r.redacted)
        for r in odf.itertuples(index=False)
    }
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"{len(mismatches)} divergent, e.g. " + str(
        list(mismatches.items())[:3]
    )


def _py_pack(rows, seq_len):
    """Reference packer: per bucket, (doc, idx) order, start-offset bins."""
    out = {}
    by_bucket = {}
    for bucket, doc, idx, tok in rows:
        by_bucket.setdefault(bucket, []).append((doc, idx, tok))
    for bucket, items in by_bucket.items():
        items.sort()
        cum = 0
        for doc, idx, tok in items:
            seq = cum // seq_len
            n, t = out.get((bucket, seq), (0, 0))
            out[(bucket, seq)] = (n + 1, t + tok)
            cum += tok
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pack_sequences_matches_python_reference(spark, seed):
    rng = random.Random(seed)
    seq_len = rng.choice([16, 64, 128, 500])
    n_buckets = rng.choice([1, 3, 8])
    rows = []
    for doc in range(rng.randint(1, 60)):
        for idx in range(rng.randint(1, 6)):
            rows.append((doc, idx, rng.randint(1, seq_len * 2)))
    chunks = spark.createDataFrame(
        rows, "doc_id long, chunk_idx long, n_tokens long"
    )
    packed = corpus.pack_sequences(chunks, seq_len=seq_len, n_buckets=n_buckets)
    got = {
        (r["bucket"], r["seq_id"]): (r["n_chunks"], r["seq_tokens"])
        for r in packed.collect()
    }
    # Recompute each row's bucket with the engine's own md5 rule (read it
    # back) so the reference packer sees identical bucket assignments.
    import hashlib

    def bucket_of(doc):
        h = hashlib.md5(f"pack:{doc}".encode()).hexdigest()[:14]
        return int(h, 16) % n_buckets

    want = _py_pack(
        [(bucket_of(d), d, i, t) for d, i, t in rows], seq_len
    )
    assert got == want


# ---------------------------------------------------------------------------
# Unicode-normalization cross-engine fuzz
# ---------------------------------------------------------------------------

# Alphabet: controls (strip/convert branches), ASCII, Latin-1/Extended,
# combining diacriticals, Greek/Cyrillic/Hebrew/Arabic — capped below
# U+0800 because Python's unicodedata and DuckDB's utf8proc ship
# different Unicode versions and diverge on combining marks assigned
# later (measured: first divergence at U+0899; everything below agrees).
_NORM_ALPHABET = st.characters(
    codec="utf-8",
    min_codepoint=0x00,
    max_codepoint=0x7FF,
    exclude_categories=("Cs",),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(_NORM_ALPHABET, max_size=80)),
        min_size=1,
        max_size=12,
    )
)
def test_text_normalization_matches_oracle_on_unicode_fuzz(spark, texts):
    import shutil
    import tempfile

    import duckdb

    from week5_datingnlp_big_data_spark.sources.schemas import SCHEMAS

    rows = [
        (i, t, "en", "src0", 0 if t is None else len(t))
        for i, t in enumerate(texts)
    ]
    tmp = tempfile.mkdtemp(prefix="norm_fuzz_")
    try:
        spark.createDataFrame(rows, SCHEMAS["documents"]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/documents.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        name = "text_normalization_stats"
        got = sorted(
            tuple(r) for r in registry.QUERIES[name](spark, tmp).collect()
        )
        want = sorted(tuple(r) for r in con.execute(registry.ORACLE[name]).fetchall())
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
