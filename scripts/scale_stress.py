#!/usr/bin/env python
"""Reference-scale stress run: the FULL EP-1 pipeline (clean → tokenize →
stopword-remove → STEM → trimmed DFM (25/35, the reference's thresholds) →
CountVectorizer → stratified split → decision tree → confusion matrix) on
a 59,946-row synthetic profiles corpus — the reference's exact corpus size,
where it needs ~30 min of training time and 33 GB of RAM
(BASELINE.md). Prints one JSON line with per-stage wall-clock.

Usage: python scripts/scale_stress.py [n_rows]
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 59_946
OUT = "/tmp/scale_stress_profiles.parquet"


def generate(spark, n_rows: int):
    """60k-row profiles corpus, generated distributed (driver-side loops
    at this size would dominate the measurement): seed-per-row on
    executors via mapInPandas."""
    import numpy as np
    import pandas as pd

    from week5_datingnlp_big_data_spark.sources.schemas import PROFILES_SCHEMA

    male = ["guy", "guys", "sports", "engineering", "beard", "whiskey"]
    female = ["girl", "girls", "dancing", "yoga", "sparkle", "brunch"]
    common = [
        "think", "kind", "intellectual", "either", "music", "coffee",
        "travel", "books", "hiking", "movies", "food", "friends", "work",
        "life", "ocean", "sunset", "guitar", "kitchen", "garden", "city",
    ]
    noise = ["<br />", "&amp;", "42", "mid-century", "don't", "x", "---", "the", "love", "i'm"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"]:
                rng = random.Random(1234 + int(doc_id))
                sex = "m" if rng.random() < 0.6 else "f"
                skew = male if sex == "m" else female
                essays = []
                for _ in range(10):
                    if rng.random() < 0.1:
                        essays.append("")
                        continue
                    words = []
                    for _ in range(rng.randint(30, 90)):
                        r = rng.random()
                        if r < 0.2:
                            words.append(rng.choice(skew))
                        elif r < 0.5:
                            words.append(rng.choice(common))
                        elif r < 0.8:
                            # mid-frequency band: ~20k distinct terms with
                            # doc-freq well above the 25/35 trim → a
                            # realistically WIDE surviving vocabulary
                            # (reference: 12,857 features post-trim)
                            words.append(f"mid{int(rng.random() ** 2 * 20_000)}")
                        elif r < 0.9:
                            # rare band: ~200k distinct terms with df ≈ 1-3
                            # → trimmed away (reference: 91.6 % of 153k
                            # features removed)
                            words.append(f"rare{rng.randint(0, 200_000)}")
                        else:
                            words.append(rng.choice(noise))
                    essays.append(" ".join(words))
                rows.append((
                    int(doc_id), rng.randint(18, 70), "single", sex, "straight",
                    "fit", "anything", "socially", "", "college", "white",
                    66.0 + rng.random() * 12, -1, "engineer",
                    "2012-06-28-20-30", "san francisco, california", "",
                    "likes dogs", "", "gemini", "no", "english", *essays,
                ))
            yield pd.DataFrame(rows, columns=[f.name for f in PROFILES_SCHEMA.fields])

    ids = spark.range(n_rows).repartition(64)
    return ids.mapInPandas(gen, PROFILES_SCHEMA)


def main() -> None:
    from week5_datingnlp_big_data_spark.plans import pipelines
    from week5_datingnlp_big_data_spark.session import get_spark
    from week5_datingnlp_big_data_spark.sources import sinks

    spark = get_spark("scale-stress", extra_conf={"spark.driver.memory": "24g"})
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    generate(spark, N_ROWS).write.mode("overwrite").parquet(OUT)
    timings["generate_write"] = round(time.perf_counter() - t0, 1)

    profiles = spark.read.parquet(OUT)

    t0 = time.perf_counter()
    r = pipelines.ep1_classification(
        profiles, min_docfreq=25, min_termfreq=35, max_depth=5
    )
    n_vocab = len(r.vocabulary)
    confusion = {(row["predicted"], row["actual"]): row["n"] for row in r.confusion.collect()}
    timings["ep1_full"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    # EP-2 reuses EP-1's trimmed DFM (the reference reuses all.tokens the
    # same way, R:234) rather than re-tokenizing from raw text; the
    # standalone ep2_tfidf(tokenized) path stays for fresh-corpus use.
    from week5_datingnlp_big_data_spark.operators import tfidf as tfidf_op

    tfidf_rows = tfidf_op.tf_idf(r.counts).count()
    timings["ep2_tfidf"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    r3 = pipelines.ep3_word_analysis(profiles, top_k=25, distinct_k=500)
    male_top = [x["word"] for x in r3.distinctive_male.take(5)]
    timings["ep3_freq"] = round(time.perf_counter() - t0, 1)

    timings["total"] = round(sum(timings.values()), 1)
    print(json.dumps({
        "n_docs": N_ROWS,
        "vocab_after_trim": n_vocab,
        "accuracy": round(r.accuracy, 4),
        "confusion": {f"{k[0]}/{k[1]}": v for k, v in confusion.items()},
        "tfidf_rows": tfidf_rows,
        "distinctive_male_top5": male_top,
        "timings_sec": timings,
        "reference_baseline": "27-30 min train, 33 GB RAM, single R process",
    }))


if __name__ == "__main__":
    main()
