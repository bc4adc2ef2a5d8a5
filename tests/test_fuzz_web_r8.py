"""Fuzz the late round-8 web operators against independent pure-Python
twins on hostile random inputs: redirect graphs with cycles, diamonds,
self-loops, and over-long chains; host-cap inputs dense with score ties
(forcing the salted two-stage top-k to prove itself exact); WARC
round-trips with wrong declared lengths; anchor pages with same-host
links, repeated words, and empty anchor text. The twins share NO code
with the operators — dict walks and sorted-truncates, not DataFrames."""

from __future__ import annotations

import random
import re

from week5_datingnlp_big_data_spark.operators import web


def test_fuzz_resolve_redirects_vs_pointer_chase(spark):
    rng = random.Random(20260816)
    for trial in range(6):
        n = rng.randint(5, 60)
        nodes = [f"n{i}" for i in range(n + 15)]  # tail nodes = terminals
        edges = []
        for i in range(n):
            # multi-edges on some srcs: min(dst) must win
            for _ in range(rng.choice([1, 1, 1, 2])):
                edges.append((nodes[i], rng.choice(nodes)))
        # guaranteed long chain (> max_hops) and a tight cycle
        chain = [f"c{trial}_{k}" for k in range(20)]
        edges += list(zip(chain, chain[1:])) + [(chain[-1], "cterm")]
        edges += [("loopA", "loopB"), ("loopB", "loopA"), ("selfy", "selfy")]
        max_hops = rng.choice([4, 8, 16])

        succ: dict[str, str] = {}
        for s, d in edges:
            if s not in succ or d < succ[s]:
                succ[s] = d

        def twin(src):
            cur, hops = src, 0
            while cur in succ and hops <= max_hops:
                cur = succ[cur]
                hops += 1
            if cur in succ or hops > max_hops:
                return (src, None, None, False)
            return (src, cur, hops, True)

        expected = {s: twin(s) for s in succ}
        df = spark.createDataFrame(edges, "src_url string, dst_url string")
        got = {
            r["url"]: (r["url"], r["final_url"], r["hops"], r["resolved"])
            for r in web.resolve_redirects(df, max_hops=max_hops).collect()
        }
        assert got == expected, f"trial {trial} max_hops {max_hops}"


def test_fuzz_host_cap_sample_vs_sorted_truncate(spark):
    rng = random.Random(20260817)
    for trial in range(5):
        rows = []
        for i in range(rng.randint(10, 200)):
            rows.append((
                f"h{rng.randint(0, 6)}",
                i,
                float(rng.choice([0.0, 1.0, 1.0, 2.5, -3.0,
                                  rng.randint(0, 4)])),
            ))
        cap = rng.choice([1, 2, 3, 5])
        expected = set()
        by_host: dict[str, list] = {}
        for h, i, s in rows:
            by_host.setdefault(h, []).append((s, i))
        for h, lst in by_host.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            for rank, (s, i) in enumerate(lst[:cap], start=1):
                expected.add((h, i, s, rank))
        df = spark.createDataFrame(
            rows, "host string, doc_id long, score double"
        )
        got = {
            (r["host"], r["doc_id"], r["score"], r["host_rank"])
            for r in web.host_cap_sample(
                df, cap=cap, n_salts=4
            ).select("host", "doc_id", "score", "host_rank").collect()
        }
        assert got == expected, f"trial {trial} cap {cap}"


def test_fuzz_parse_warc_round_trip(spark):
    rng = random.Random(20260818)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-"
    files, expected = [], set()
    for fid in range(25):
        recs = []
        for j in range(rng.randint(1, 4)):
            wtype = rng.choice(["response", "request", "metadata"])
            uri = "http://h%d.io/%s" % (
                rng.randint(0, 5),
                "".join(rng.choice("abcxyz09") for _ in range(4)),
            )
            date = "2024-%02d-01T00:00:00Z" % rng.randint(1, 12)
            payload = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 40))
            )
            declared = len(payload) + rng.choice([0, 0, 0, 1, -1])
            recs.append(
                "WARC/1.0\r\n"
                f"WARC-Type: {wtype}\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Date: {date}\r\n"
                f"Content-Length: {declared}\r\n"
                "\r\n" + payload + "\r\n\r\n"
            )
            expected.add((
                fid, j, wtype, uri, date, declared, payload,
                declared == len(payload),
            ))
        files.append((fid, "".join(recs)))
    df = spark.createDataFrame(files, "file_id long, warc_text string")
    got = {
        (r["file_id"], r["record_idx"], r["warc_type"], r["target_uri"],
         r["warc_date"], r["content_length"], r["payload"], r["length_ok"])
        for r in web.parse_warc(df).collect()
    }
    assert got == expected


def test_fuzz_anchor_term_profile_vs_python_twin(spark):
    rng = random.Random(20260819)
    words = ["Alpha", "beta", "GAMMA", "delta9", "", "two words", "beta"]
    pages = []
    for pid in range(40):
        src_host = f"s{rng.randint(0, 3)}.io"
        parts = []
        for _ in range(rng.randint(0, 5)):
            dst = f"s{rng.randint(0, 3)}.io"  # collisions = same-host drops
            parts.append(
                f'<a href="http://{dst}/p">{rng.choice(words)}</a>'
            )
            parts.append("filler text outside anchors")
        pages.append((f"http://{src_host}/page{pid}", " ".join(parts)))

    counts: dict[tuple, int] = {}
    pat = re.compile(r'<a href="http://([^/"]*)/p">([^<]*)</a>')
    for url, text in pages:
        src = url.split("//")[1].split("/")[0]
        for dst, atext in pat.findall(text):
            if dst == src:
                continue
            for term in re.split(r"[^a-z0-9]+", atext.lower()):
                if term:
                    counts[(dst, term)] = counts.get((dst, term), 0) + 1
    k = 2
    expected = set()
    by_host: dict[str, list] = {}
    for (h, t), n in counts.items():
        by_host.setdefault(h, []).append((n, t))
    for h, lst in by_host.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (n, t) in enumerate(lst[:k], start=1):
            expected.add((h, t, n, rank))

    df = spark.createDataFrame(pages, "url string, text string")
    got = {
        (r["host"], r["term"], r["n_mentions"], r["term_rank"])
        for r in web.anchor_term_profile(df, k=k).collect()
    }
    assert got == expected
