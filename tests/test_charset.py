"""Charset/encoding hygiene (operators/charset.py): repair-table
round-trip integrity, marker counting, classification, and the repair
chain on hand-built mojibake."""

from __future__ import annotations

from week5_datingnlp_big_data_spark.operators import charset


def test_table_is_cp1252_round_trip_and_longest_first():
    for moji, ch in charset.MOJIBAKE_TABLE:
        assert ch.encode("utf-8").decode("cp1252") == moji
        assert all(ord(c) >= 0x80 for c in moji)  # every marker char non-ascii
        assert len(ch) == 1
    lens = [len(m) for m, _ in charset.MOJIBAKE_TABLE]
    assert lens == sorted(lens, reverse=True)
    # no marker is a prefix of another (replace order cannot shadow)
    marks = [m for m, _ in charset.MOJIBAKE_TABLE]
    for a in marks:
        for b in marks:
            if a != b:
                assert not b.startswith(a) or len(b) <= len(a)


def test_encoding_profile_hand_cases(spark):
    rows = [
        (1, "plain ascii text", "utf-8"),
        (2, "café résumé", "utf-8"),          # clean utf8
        (3, "cafÃ© is nice", "utf-8"),                        # mojibake é
        (4, "donâ€™t stop", "ascii"),                          # mojibake ’
        (5, "naïve déjà", "ascii"),            # declared-ascii mismatch
        (6, None, "utf-8"),                                    # NULL text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, declared string")
    got = {
        r["doc_id"]: r
        for r in charset.encoding_profile(df, declared_col="declared").collect()
    }
    assert got[1]["charset_class"] == "ascii" and not got[1]["is_mismatch"]
    assert got[2]["charset_class"] == "utf8" and got[2]["n_moji_marks"] == 0
    assert got[3]["charset_class"] == "mojibake" and got[3]["n_moji_marks"] == 1
    assert got[3]["is_mismatch"]
    assert got[4]["charset_class"] == "mojibake" and got[4]["is_mismatch"]
    assert got[5]["charset_class"] == "utf8" and got[5]["is_mismatch"]
    assert got[6]["charset_class"] == "ascii" and got[6]["n_chars"] == 0


def test_mojibake_repair_round_trip_every_marker(spark):
    # encode->cp1252-decode every repair char, repair must restore it
    clean = "start " + " ".join(c for _, c in charset.MOJIBAKE_TABLE) + " end"
    broken = clean.encode("utf-8").decode("cp1252")
    df = spark.createDataFrame([(1, broken), (2, "untouched")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in charset.mojibake_repair(df).collect()}
    assert got[1]["text_fixed"] == clean
    assert got[1]["n_repairs"] == len(charset.MOJIBAKE_TABLE)
    assert got[2]["text_fixed"] == "untouched" and got[2]["n_repairs"] == 0


def test_mojibake_repair_mixed_sentence(spark):
    broken = "Elle a achetÃ© un cafÃ© â€œtrÃ¨s bonâ€¦ voilÃ¡â€™"
    fixed = "Elle a acheté un café “très bon… voilá’"
    df = spark.createDataFrame([(1, broken)], "doc_id long, text string")
    r = charset.mojibake_repair(df).collect()[0]
    assert r["text_fixed"] == fixed and r["n_repairs"] == 7


def test_extract_links_hosts_and_weights(spark):
    from week5_datingnlp_big_data_spark.operators import web

    rows = [
        (1, "http://a.io/p",
         '<a href="http://b.io/x">b</a> <a href="HTTP://WWW.B.io:80/y">b2</a>'
         ' <a href="/relative">self</a> <a href="http://a.io/q">self2</a>'),
        (2, "http://a.io/q", '<a href="http://c.io/z">c</a>'),
        (3, "http://b.io/r", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {
        (r["src_host"], r["dst_host"]): r["w"]
        for r in web.extract_links(df).collect()
    }
    # relative hrefs and self-links dropped; host case/www/port folded
    assert got == {("a.io", "b.io"): 2, ("a.io", "c.io"): 1}
