"""URL/host-level corpus hygiene: the crawl-preprocessing steps a web
corpus runs BEFORE content dedup — URL canonicalization, exact-URL
dedup (keep-first), and the per-host rollup view used for host-level
quality decisions (cf. C4's URL dedup in Raffel et al. 2020 §2.2,
CCNet's per-snapshot URL dedup in Wenzek et al. 2020 §3.1, and
RefinedWeb's URL filtering + host-level curation in Penedo et al. 2023
§3.1). No analog in the reference (`Week5_datingNLP.R` ingests a flat
CSV); this module is north-star training-data surface.

Scale shape: canonicalization is pure string/HOF column algebra —
``regexp_extract`` / ``split`` / ``filter`` / ``array_sort`` /
``array_join`` — a shuffle-free scan-speed map with no Python in the
loop (one WholeStageCodegen span at 100 TB). Dedup aggregates
``min(id)`` per canonical URL with a groupBy (map-side partial) and
joins the keeper back on the canonical key rather than using a window:
a window min would buffer every duplicate of a hot URL in one task,
while the groupBy+join form partial-aggregates map-side and lets AQE
split a skewed probe side. The host rollup is a single map-side-partial
groupBy on the canonical host.

Canonical form (the common normalization core of the pipelines above):
  * scheme lowercased
  * host lowercased, one leading ``www.`` label stripped
  * default ports dropped (``:80`` for http, ``:443`` for https);
    non-default ports kept
  * path: repeated ``/`` collapsed, trailing ``/`` stripped (so the
    root path canonicalizes to the empty string)
  * query: ``&``-split, tracking params dropped (``utm_*``, ``fbclid``,
    ``gclid``, ``msclkid``, ``ref``), the rest byte-sorted and rejoined
  * fragment dropped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one leading www. label (case already folded when this is applied)
_WWW_PAT = "^www\\."

# tracking query parameters dropped during canonicalization
TRACKING_PARAM_PAT = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_col(url), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def _authority(url: Column | str) -> Column:
    return F.regexp_extract(_col(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1)


def canonical_host(url: Column | str) -> Column:
    """Lowercased host with one leading ``www.`` stripped and any
    explicit port removed — the host-level grouping key."""
    host = F.lower(F.regexp_extract(_authority(url), r"^([^:]*)", 1))
    return F.regexp_replace(host, _WWW_PAT, "")


def _canonical_port(url: Column | str) -> Column:
    """``:port`` suffix kept only when non-default for the scheme."""
    port = F.regexp_extract(_authority(url), r":(\d+)$", 1)
    scheme = url_scheme(url)
    default = (
        (scheme == F.lit("http")) & (port == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (port == F.lit("443")))
    return F.when(
        (port == F.lit("")) | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))


def _canonical_path(url: Column | str) -> Column:
    path = F.regexp_extract(
        _col(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    collapsed = F.regexp_replace(path, "/{2,}", "/")
    return F.regexp_replace(collapsed, "/+$", "")


def _canonical_query(url: Column | str) -> Column:
    """Tracking params out, survivors byte-sorted, ``?`` re-prefixed
    (empty when nothing survives)."""
    qs = F.regexp_extract(_col(url), r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_PARAM_PAT),
    )
    joined = F.array_join(F.array_sort(params), "&")
    return F.when(joined == F.lit(""), F.lit("")).otherwise(
        F.concat(F.lit("?"), joined)
    )


def canonical_url(url: Column | str) -> Column:
    """Full canonical form — pure Catalyst string algebra, no UDF.

    Robustness contract: a URL with no ``scheme://`` prefix (relative or
    schemeless input, which real crawl frontiers do contain) falls back
    to the raw string — distinct schemeless URLs must NOT collapse into
    one degenerate ``://``-prefixed dedup group. A NULL url canonicalizes
    to NULL (callers treat NULL-keyed rows as pass-through keepers)."""
    canon = F.concat(
        url_scheme(url),
        F.lit("://"),
        canonical_host(url),
        _canonical_port(url),
        _canonical_path(url),
        _canonical_query(url),
    )
    return F.when(url_scheme(url) == F.lit(""), _col(url)).otherwise(canon)


def url_dedup_keep_first(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact URL dedup, keep-first: canonicalize, elect ``min(id)`` per
    canonical URL, flag everything else as a duplicate. Adds
    ``canonical_url`` and ``is_kept``; rows and all input columns pass
    through.

    Keeper election is groupBy ``min`` + equi-join back (not a window):
    partial aggregation bounds a hot URL's cost map-side and AQE can
    split the skewed join — the same bound-before-join discipline the
    dedup family uses (see operators/dedup.py).

    NULL urls canonicalize to NULL and pass through as keepers
    (``is_kept`` true): the keeper attach is a LEFT join, so a NULL key —
    which an equi-join would silently drop — keeps its row, and NULL
    rows are never deduped against each other. Schemeless URLs
    canonicalize to themselves (see :func:`canonical_url`), so only
    byte-identical raw strings dedup.
    """
    with_canon = df.withColumn("canonical_url", canonical_url(url_col))
    keepers = with_canon.filter(F.col("canonical_url").isNotNull()).groupBy(
        "canonical_url"
    ).agg(F.min(id_col).alias("_keep_id"))
    return (
        with_canon.join(keepers, "canonical_url", "left")
        .withColumn(
            "is_kept",
            F.coalesce(F.col(id_col) == F.col("_keep_id"), F.lit(True)),
        )
        .drop("_keep_id")
    )


def host_rollup(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host corpus view (RefinedWeb §3.1's host-level curation
    signal): page count, distinct canonical URLs, exact-dup rate, word
    totals, and mean document length. One map-side-partial groupBy on
    the canonical host; word counts are scan-speed HOF expressions.

    Returned columns: ``host``, ``n_docs``, ``n_urls`` (distinct
    canonical), ``n_dup_docs`` (docs that lost keep-first election),
    ``total_words``, ``avg_words`` (round 6).
    """
    deduped = url_dedup_keep_first(df, url_col=url_col, id_col=id_col)
    # coalesce BEFORE trim: a NULL text must count as 0 words (the bare
    # equality predicate would be NULL and fall through to size(split(
    # NULL)) = NULL, silently dropping the row from avg_words)
    t = F.trim(F.coalesce(_col(text_col), F.lit("")))
    n_words = F.when(t == F.lit(""), F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )
    return (
        deduped.withColumn("host", canonical_host(url_col))
        .withColumn("_w", n_words)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canonical_url").alias("n_urls"),
            F.sum((~F.col("is_kept")).cast("long")).alias("n_dup_docs"),
            F.sum("_w").alias("total_words"),
            F.round(F.avg("_w"), 6).alias("avg_words"),
        )
    )


def frontier_schedule(
    df: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    id_col: str = "doc_id",
    max_per_host: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier schedule: each host is fetched at
    most once per tick (the one-connection-per-host rule every polite
    crawler enforces), higher-priority URLs within a host go first, and
    ticks interleave hosts fairly. Returns the input plus ``host``,
    ``canonical_url``, ``tick`` (0-based per-host fetch round) and
    ``crawl_order`` (global dispatch key = tick · n_hosts + host_idx —
    a total order that round-robins across hosts).

    Scale shape: the only URL-cardinality window is the per-host rank
    (one shuffle on host, per-partition size = URLs of one host, the
    same key politeness itself bounds). The GLOBAL interleave is NOT a
    global window over URLs — ``host_idx`` is the host's dense
    alphabetical rank over the host DIMENSION, computed WITHOUT a
    single-partition sort (a 100 TB crawl has ~10⁸ hosts, so even the
    dim must never funnel through one task): range-partition the
    distinct hosts, rank within each range partition, and add the
    exclusive prefix sum of per-partition counts — the distributed
    zipWithIndex pattern in pure DataFrame algebra. Only the
    per-partition count table (one row per shuffle partition, bounded
    by cluster config, never by data) rides a single-partition window
    and a broadcast; the host dim itself is joined back with NO
    broadcast hint — AQE picks the strategy from its measured size.
    Exact duplicates should be removed first
    (:func:`url_dedup_keep_first`); ``max_per_host`` caps runaway hosts
    (the crawl-budget rule, RefinedWeb §3.1).
    """
    from pyspark.sql import Window

    canon = df.withColumn("canonical_url", canonical_url(url_col)).withColumn(
        "host", canonical_host(url_col)
    )
    per_host = Window.partitionBy("host").orderBy(
        F.desc(priority_col), F.asc("canonical_url"), F.asc(id_col)
    )
    ranked = canon.withColumn(
        "tick", (F.row_number().over(per_host) - 1).cast("long")
    )
    if max_per_host is not None:
        ranked = ranked.filter(F.col("tick") < max_per_host)
    # Dense alphabetical host index, scale-safe: local rank within a
    # RANGE partition + exclusive prefix-sum of partition counts equals
    # the global row_number ORDER BY host, with no host-cardinality
    # data ever in one task.
    local = (
        canon.select("host")
        .distinct()
        .repartitionByRange("host")
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local",
            F.row_number()
            .over(Window.partitionBy("_pid").orderBy("host"))
            .cast("long"),
        )
    )
    # one row per shuffle partition — bounded by config, not data; the
    # single-partition window and the broadcast below are over THIS
    # table only, never the host dim
    part_counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_prev = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = part_counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0))
        .cast("long")
        .alias("_off"),
        F.sum("_cnt").over(w_all).cast("long").alias("n_hosts"),
    )
    host_dim = local.join(F.broadcast(offsets), "_pid").select(
        "host",
        (F.col("_off") + F.col("_local") - 1).alias("host_idx"),
        "n_hosts",
    )
    return (
        ranked.join(host_dim, "host")
        .withColumn(
            "crawl_order", F.col("tick") * F.col("n_hosts") + F.col("host_idx")
        )
        .drop("n_hosts")
    )


# href attribute of an anchor tag; group 1 is the target URL. [^>]* and
# [^"]* (never .*?) keep the behavior identical between Java regex and
# RE2 (the DuckDB twin's engine).
ANCHOR_HREF_PAT = '<[aA][^>]*\\shref="([^"]*)"'


def extract_links(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Host→host link edges from anchor hrefs — the input to the
    link-graph quality prior (PageRank over hosts; cf. Page et al.
    1999, and RefinedWeb §3.1's URL-level quality signals): extract
    every ``<a href="...">`` target, canonicalize source and target
    hosts, and aggregate to a weighted edge list ``(src_host,
    dst_host, w)``. Relative hrefs (no scheme — intra-host by
    definition) and self-links are dropped: the signal is cross-host
    endorsement.

    Scale shape: extraction is one scan-speed regexp_extract_all +
    explode; the only shuffle is the (src,dst) groupBy whose
    cardinality is host-pair-bounded, orders of magnitude below the
    page count. No UDF, no collect."""
    src = canonical_host(url_col)
    hrefs = F.regexp_extract_all(
        F.coalesce(_col(text_col), F.lit("")),
        F.lit(ANCHOR_HREF_PAT),
        F.lit(1),
    )
    pairs = df.select(
        src.alias("src_host"), F.explode(hrefs).alias("_href")
    ).select("src_host", canonical_host("_href").alias("dst_host"))
    return (
        pairs.filter(
            (F.col("dst_host") != F.lit(""))
            & (F.col("src_host") != F.lit(""))
            & (F.col("dst_host") != F.col("src_host"))
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("w"))
    )
