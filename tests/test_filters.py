

def test_boilerplate_planted_page(spark):
    from week5_datingnlp_big_data_spark.operators.filters import (
        boilerplate_line_stats,
    )

    page = "\n".join([
        "Home | About | Contact | Login",                      # nav -> boiler
        "the quick brown fox jumped over the lazy sleeping dog",  # good
        "short one",                                            # short
        "fox den near the river bank was quiet today it seems",   # good
        "words lacking function vocabulary terms",              # near (no stop, 5w)
        '<a href="/m">Read more</a> <a href="/s">Subscribe</a>',  # link -> boiler
        "Copyright 2021 Example Inc All Rights Reserved",       # boiler
    ])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    rows = {r["line_idx"]: r for r in boilerplate_line_stats(df).collect()}
    assert [rows[i]["klass"] for i in range(7)] == [
        "boiler", "good", "short", "good", "near", "boiler", "boiler",
    ]
    # context rule: the near line at idx 4 touches the good line at 3
    assert rows[4]["keep"] is True
    assert [rows[i]["keep"] for i in (0, 2, 5, 6)] == [False] * 4
    assert rows[5]["link_density"] > 0.4
    assert rows[1]["stopword_ratio"] > 0.2


def test_boilerplate_near_without_good_neighbor_dropped(spark):
    from week5_datingnlp_big_data_spark.operators.filters import (
        boilerplate_line_stats,
    )

    page = "\n".join([
        "Menu | News | Sports",                         # boiler
        "words without function terms anywhere nearby",  # near, neighbors boiler
        "Privacy | Terms | Copyright 2022",              # boiler
    ])
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    rows = {r["line_idx"]: r for r in boilerplate_line_stats(df).collect()}
    assert rows[1]["klass"] == "near" and rows[1]["keep"] is False


def test_boilerplate_blank_lines_skipped_indexes_kept(spark):
    from week5_datingnlp_big_data_spark.operators.filters import (
        boilerplate_line_stats,
    )

    page = "the cat sat on the mat with a hat\n\n  \nMenu | Home | End"
    df = spark.createDataFrame([(1, page)], "doc_id long, text string")
    rows = boilerplate_line_stats(df).orderBy("line_idx").collect()
    assert [r["line_idx"] for r in rows] == [0, 3]


def test_extract_main_content_rebuilds_in_order(spark):
    from week5_datingnlp_big_data_spark.operators.filters import (
        extract_main_content,
    )

    good1 = "the quick brown fox jumped over the lazy sleeping dog"
    near = "words lacking function vocabulary terms"
    good2 = "fox den near the river bank was quiet today it seems"
    page = "\n".join([
        "Home | About | Contact | Login",
        good1, near, good2,
        "Copyright 2021 Example Inc All Rights Reserved",
    ])
    all_boiler = "Menu | News | Sports\nCopyright 2022 Example"
    df = spark.createDataFrame(
        [(1, page), (2, all_boiler)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in extract_main_content(df).collect()}
    assert rows[1]["main_text"] == "\n".join([good1, near, good2])
    assert (rows[1]["n_lines"], rows[1]["n_kept_lines"]) == (5, 3)
    # all-boilerplate docs keep an empty rewrite, not a dropped row
    assert rows[2]["main_text"] == "" and rows[2]["n_kept_lines"] == 0
