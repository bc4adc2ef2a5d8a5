"""Raw-corpus ingestion (sources/ingest.py): text/JSONL directories with
deterministic ids, gzip transparency, and corrupt-line quarantine."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from week5_datingnlp_big_data_spark.sources import ingest


@pytest.fixture(scope="module")
def text_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    (d / "a.txt").write_text("first doc\nsecond doc\n\n  \nthird doc\n")
    with gzip.open(d / "b.txt.gz", "wt") as f:
        f.write("zipped one\nzipped two\n")
    return str(d)


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [{"id": 1, "text": "hello"}, {"id": 2, "text": "world"}]
    (d / "a.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n{broken\n")
    with gzip.open(d / "b.jsonl.gz", "wt") as f:
        f.write(json.dumps({"id": 3, "text": "zipped"}) + "\n")
    return str(d)


def test_text_ingest_lines_and_gzip(spark, text_dir):
    df = ingest.ingest_text_dir(spark, text_dir).collect()
    texts = sorted(r.text for r in df)
    assert texts == ["first doc", "second doc", "third doc",
                     "zipped one", "zipped two"]
    srcs = {r.text: r.source for r in df}
    assert srcs["zipped one"] == "b.txt.gz" and srcs["first doc"] == "a.txt"


def test_text_ingest_ids_deterministic_and_distinct(spark, text_dir):
    a = {r.text: r.doc_id for r in ingest.ingest_text_dir(spark, text_dir).collect()}
    b = {r.text: r.doc_id for r in ingest.ingest_text_dir(spark, text_dir).collect()}
    assert a == b
    assert len(set(a.values())) == 5          # distinct positions -> distinct ids
    assert all(v >= 0 for v in a.values())    # 60-bit -> always positive


def test_text_ingest_content_ids_collide_for_dup_lines(spark, tmp_path):
    p = tmp_path / "dup.txt"
    p.write_text("same\nsame\nother\n")
    df = ingest.ingest_text_dir(spark, str(tmp_path), id_from="content").collect()
    ids = {}
    for r in df:
        ids.setdefault(r.text, set()).add(r.doc_id)
    assert len(ids["same"]) == 1              # exact dups share one id
    assert ids["same"] != ids["other"]


def test_text_ingest_whole_file_mode(spark, text_dir):
    df = ingest.ingest_text_dir(spark, text_dir, per_line=False).collect()
    by_src = {r.source: r.text for r in df}
    assert len(df) == 2
    assert "first doc\nsecond doc" in by_src["a.txt"]


def test_jsonl_ingest_schema_and_corrupt_quarantine(spark, jsonl_dir):
    df = ingest.ingest_jsonl_dir(
        spark, jsonl_dir, "id long, text string", source="crawl"
    ).collect()
    good = {r.id: r.text for r in df if r._corrupt is None}
    bad = [r for r in df if r._corrupt is not None]
    assert good == {1: "hello", 2: "world", 3: "zipped"}
    assert len(bad) == 1 and bad[0]._corrupt.startswith("{broken")
    assert all(r.source == "crawl" for r in df)


def test_text_ingest_rejects_unknown_id_mode(spark, text_dir):
    with pytest.raises(ValueError, match="id_from"):
        ingest.ingest_text_dir(spark, text_dir, id_from="nope")
