"""Fuzz the round-6 continuation operators against pure-Python twins on
hostile random inputs: triangle counting on random multigraphs (dupes,
reversed edges, self-loops, hubs), the CDC merge invariant on random
changelogs with timestamp ties and delete/re-insert churn, and the
unigram Viterbi round-trip under random piece tables."""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from week5_datingnlp_big_data_spark.operators import graph, relational, unigram


def _brute_triangles(pairs, min_degree=2):
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = dict.fromkeys(adj, 0)
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in sorted(adj[u]):
            if v <= u:
                continue
            for w in sorted(adj[u] & adj[v]):
                if w > v:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return {
        n: (len(adj[n]), tri[n],
            round(2.0 * tri[n] / (len(adj[n]) * (len(adj[n]) - 1)), 6))
        for n in nodes
        if len(adj[n]) >= min_degree
    }


def test_triangles_fuzz_random_multigraphs(spark):
    rng = random.Random(20260816)
    for trial in range(4):
        n = rng.randint(5, 18)
        m = rng.randint(4, 60)
        names = [f"n{i}" for i in range(n)]
        pairs = []
        # a guaranteed hub to stress the orientation
        hub = names[0]
        for other in names[1 : 1 + min(6, n - 1)]:
            pairs.append((hub, other))
        for _ in range(m):
            a, b = rng.choice(names), rng.choice(names)
            if rng.random() < 0.3:
                a, b = b, a  # reversed duplicates
            pairs.append((a, b))  # self-loops possible; must be dropped
        df = spark.createDataFrame(pairs, "src string, dst string")
        got = {
            r["item"]: (r["degree"], r["triangles"], r["clustering"])
            for r in graph.triangle_stats(df).collect()
        }
        assert got == _brute_triangles(pairs), f"trial {trial}"


def _brute_latest(rows, delete_op="D"):
    best: dict[int, tuple] = {}
    for u, ts, eid, op, v in rows:
        cur = best.get(u)
        if cur is None or (ts, eid) > (cur[0], cur[1]):
            best[u] = (ts, eid, op, v)
    return {
        u: (ts, eid, op, v)
        for u, (ts, eid, op, v) in best.items()
        if op != delete_op
    }


def test_cdc_merge_invariant_fuzz(spark):
    rng = random.Random(99)
    base_ts = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for _ in range(300):
        u = rng.randint(1, 25)
        # heavy tie pressure: only 40 distinct timestamps
        ts = base_ts + timedelta(seconds=rng.randint(0, 39))
        op = rng.choice(["I", "U", "U", "D"])
        rows.append((u, ts, eid, op, round(rng.random(), 3)))
        eid += 1
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, op string, v double"
    )
    want = _brute_latest(rows)
    # full-log snapshot equals the brute twin
    snap = relational.latest_state(
        df, ["user_id"], ["ts", "event_id"], "op", ("D",)
    )
    got = {
        r["user_id"]: (r["ts"], r["event_id"], r["op"], r["v"])
        for r in snap.collect()
    }
    assert got == want
    # merge invariant at 3 random cutoffs
    for cut_s in rng.sample(range(0, 40), 3):
        cut = base_ts + timedelta(seconds=cut_s)
        base = relational.latest_state(
            df.filter(F.col("ts") <= F.lit(cut)),
            ["user_id"], ["ts", "event_id"], "op", ("D",),
        )
        merged = relational.apply_changelog(
            base, df.filter(F.col("ts") > F.lit(cut)),
            ["user_id"], ["ts", "event_id"], "op", ("D",),
        )
        got_m = {
            r["user_id"]: (r["ts"], r["event_id"], r["op"], r["v"])
            for r in merged.collect()
        }
        assert got_m == want, f"cutoff {cut_s}"


def test_unigram_viterbi_fuzz_roundtrip_and_optimality():
    rng = random.Random(7)
    for _ in range(200):
        alpha = "ab" if rng.random() < 0.5 else "abc"
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
        # random piece table: all single chars + random multigrams
        pieces = {c: math.log(0.05) for c in alpha}
        for _ in range(rng.randint(0, 6)):
            ln = rng.randint(2, 4)
            p = "".join(rng.choice(alpha) for _ in range(ln))
            pieces[p] = math.log(rng.uniform(0.05, 0.5))
        seg = unigram.viterbi_segment(word, pieces, 4)
        assert "".join(seg) == word
        # optimality vs brute enumeration
        best = None
        stack = [([], 0)]
        while stack:
            acc, i = stack.pop()
            if i == len(word):
                score = sum(pieces[p] for p in acc)
                if best is None or score > best:
                    best = score
                continue
            for j in range(i + 1, min(i + 4, len(word)) + 1):
                if word[i:j] in pieces:
                    stack.append((acc + [word[i:j]], j))
        got = sum(pieces[p] for p in seg)
        assert best is not None and abs(got - best) < 1e-9
