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
    dim must never funnel through one task): rank the distinct hosts
    within their deterministic 6-byte-prefix bucket, and add the
    two-level exclusive prefix sum of per-bucket counts (fine 6-byte
    buckets summed within their 3-byte coarse bucket, coarse buckets
    summed on the alphabet-bounded coarse axis) — the distributed
    zipWithIndex pattern in pure DataFrame algebra, with no sampling
    pass (a range partitioner would need one per run). Only the
    COARSE count table (one row per 3-byte prefix, bounded by the key
    alphabet, never by data) rides a single-partition window and a
    broadcast; the host dim and the fine-bucket axis are joined back
    with NO broadcast hint — AQE picks the strategy from measured size.
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
    # PREFIX bucket + exclusive prefix-sums of per-bucket counts equals
    # the global row_number ORDER BY host, with no host-cardinality
    # data ever in one task. Byte-wise prefix order is consistent with
    # the full string order, so ranks compose exactly, and the buckets
    # are deterministic expressions — no sampling job per run (the r7
    # ``repartitionByRange`` shape needed one; optimization r8).
    #
    # TWO-LEVEL decomposition (optimization r9, VERDICT r8 #2): the r8
    # form ranked within the FIRST-3-BYTE bucket, so every host sharing
    # a 3-char prefix landed in ONE rank task — real crawls cluster
    # (punycode ``xn--``, national-TLD mirrors), and at the 10⁸-host
    # scale a hot bucket is a straggler. Now the rank window partitions
    # by the first SIX bytes (_b6), collapsing a hot 3-prefix into up to
    # charset³ independent tasks; the _b6 count axis is data-bounded
    # (could itself be large), so ITS prefix sum is again two-level:
    # within the 3-byte coarse bucket (_b3 — each partition ≤ charset³
    # fine buckets), then a single-partition window over the
    # alphabet-bounded _b3 axis only. global rank = coarse offset
    # + fine-in-coarse offset + local rank.
    local = (
        canon.select("host")
        .distinct()
        .withColumn("_b6", F.substring("host", 1, 6))
        .withColumn(
            "_local",
            F.row_number()
            .over(Window.partitionBy("_b6").orderBy("host"))
            .cast("long"),
        )
        # bucket population in the SAME window pass (same partitioning,
        # no ordering → no extra exchange or sort): the fine-bucket
        # count table below then needs no aggregation over the host dim
        .withColumn(
            "_bcnt",
            F.count(F.lit(1))
            .over(Window.partitionBy("_b6"))
            .cast("long"),
        )
    )
    # the host dim feeds BOTH the bucket-count rollup and the index
    # join-back: one lazy truncation, one distinct+rank execution
    local = local.localCheckpoint(eager=False)
    c6 = (
        local.filter(F.col("_local") == 1)
        .select("_b6", F.col("_bcnt").alias("_cnt"))
        .withColumn("_b3", F.substring("_b6", 1, 3))
    )
    # coarse rollup derives from the PRE-window fine counts (both
    # consumers sit on c6's aggregation exchange, reused at runtime)
    c3 = c6.groupBy("_b3").agg(F.sum("_cnt").alias("_cnt3"))
    w_in3 = (
        Window.partitionBy("_b3")
        .orderBy("_b6")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c6 = c6.withColumn(
        "_off_in3",
        F.coalesce(F.sum("_cnt").over(w_in3), F.lit(0)).cast("long"),
    )
    # one row per COARSE prefix bucket — bounded by the key alphabet,
    # not by data; the single-partition window and the broadcast below
    # are over THIS table only, never the host dim or the fine axis
    w_prev = Window.orderBy("_b3").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("_b3").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets3 = c3.select(
        "_b3",
        F.coalesce(F.sum("_cnt3").over(w_prev), F.lit(0))
        .cast("long")
        .alias("_off3"),
        F.sum("_cnt3").over(w_all).cast("long").alias("n_hosts"),
    )
    off6 = c6.join(F.broadcast(offsets3), "_b3").select(
        "_b6",
        (F.col("_off3") + F.col("_off_in3")).alias("_off"),
        "n_hosts",
    )
    # fine-offset join-back is NOT hinted: the _b6 axis is data-bounded,
    # AQE picks the strategy from its measured size
    host_dim = local.join(off6, "_b6").select(
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


# ----------------------------------------------------------------------
# robots.txt politeness rules (RFC 9309, the Robots Exclusion Protocol).
# Engine spec (documented subset of the RFC, same in the DuckDB twins):
#   * lines are `Directive: value`; `#` comments stripped; blanks ignored
#   * a GROUP is one-or-more consecutive User-agent lines followed by
#     its Allow/Disallow rules; a User-agent line after a rule line
#     starts a NEW group (RFC 9309 §2.2.1)
#   * empty rule values are ignored (an empty Disallow allows all)
#   * patterns: literal path prefixes, `*` wildcards, and a TRAILING `$`
#     end anchor (§2.2.3); matching is against the URL PATH
#   * verdict: longest matching pattern wins, ties go to Allow
#     (§2.2.2); no matching rule means allowed
# ----------------------------------------------------------------------

# regex metachars escaped when compiling a robots pattern to a regex —
# `*` (wildcard) and `$` (anchor, trailing only) get special handling
_ROBOTS_ESC_CHARS = "\\.[]{}()+?^|"


def robots_pattern_regex(pattern: Column | str) -> Column:
    """Compile a robots path pattern to an anchored regex — pure column
    algebra so both engines build the identical regex: escape metachars,
    `*` → `.*`, keep one TRAILING `$` as the end anchor (non-trailing
    `$` is literal), prepend `^`."""
    p = _col(pattern)
    anchored = p.endswith("$")
    body = F.when(
        anchored, F.substring(p, 1, F.length(p) - 1)
    ).otherwise(p)
    esc = body
    for ch in _ROBOTS_ESC_CHARS + "$":
        esc = F.replace(esc, F.lit(ch), F.lit("\\" + ch))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), esc, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
) -> DataFrame:
    """Parse per-host robots.txt into a flat rules table ``(host, agent,
    allow, pattern, pattern_len, pattern_re)`` — one row per (agent ×
    rule) pair in the agent's group.

    Group assignment is gaps-and-islands over the line order: a
    User-agent line whose previous directive line is NOT a User-agent
    line opens a new group (consecutive User-agent lines share their
    rules, per RFC 9309 §2.2.1). One per-host window — robots.txt is
    spec-capped (500 KiB), so per-host line counts are bounded and the
    rules table is host-cardinality-sized: a dimension, never data."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(_col(robots_col), F.lit("")), "\n")
        ).alias("line_no", "_raw"),
    ).withColumn("_l", F.trim(F.regexp_replace("_raw", "#.*$", "")))
    directive = F.lower(F.trim(F.regexp_extract("_l", "^([^:]+):", 1)))
    value = F.trim(F.regexp_extract("_l", "^[^:]+:(.*)$", 1))
    parsed = (
        lines.filter(F.length("_l") > 0)
        .select(
            "host",
            "line_no",
            directive.alias("_d"),
            value.alias("_v"),
        )
        .filter(F.col("_d").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("_d") == "user-agent"
    new_grp = is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False))
    grouped = parsed.withColumn(
        "grp",
        F.sum(new_grp.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    agents = grouped.filter(is_ua).select(
        "host", "grp", F.lower(F.col("_v")).alias("agent")
    )
    rules = grouped.filter(~is_ua & (F.length("_v") > 0)).select(
        "host",
        "grp",
        (F.col("_d") == "allow").alias("allow"),
        F.col("_v").alias("pattern"),
        F.length("_v").cast("long").alias("pattern_len"),
        robots_pattern_regex(F.col("_v")).alias("pattern_re"),
    )
    return agents.join(rules, ["host", "grp"]).select(
        "host", "agent", "allow", "pattern", "pattern_len", "pattern_re"
    )


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply parsed robots rules to a crawl frontier: per URL, the
    longest matching pattern among the agent's rules decides (ties go to
    Allow; no match means allowed). Returns the frontier's id plus
    ``host``, ``path``, ``is_allowed``, and the winning
    ``matched_pattern`` (NULL when no rule matched).

    Scale shape: one equi-join frontier→rules on host (per-URL fan-out
    bounded by the host's rule count — robots.txt is spec-capped), the
    regex match rides the join rows at scan speed, and the verdict is a
    groupBy struct-max (longest, then Allow, then pattern — a total
    order): no window ever buffers a URL's rows, and AQE sizes the join
    since the rules side is a host-cardinality dimension."""
    path = F.regexp_extract(
        _col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    base = frontier.select(
        F.col(id_col),
        canonical_host(url_col).alias("host"),
        path.alias("path"),
    )
    r = rules.filter(F.lower(F.col("agent")) == agent.lower()).select(
        "host", "allow", "pattern", "pattern_len", "pattern_re"
    )
    j = base.join(r, "host", "left")
    m = F.expr("path rlike pattern_re")
    best = (
        j.groupBy(id_col, "host", "path")
        .agg(
            F.max(
                F.when(
                    m,
                    F.struct(
                        F.col("pattern_len"),
                        F.col("allow").cast("int").alias("allow_i"),
                        F.col("pattern"),
                    ),
                )
            ).alias("_best")
        )
    )
    return best.select(
        id_col,
        "host",
        "path",
        F.coalesce(F.col("_best.allow_i") == 1, F.lit(True)).alias(
            "is_allowed"
        ),
        F.col("_best.pattern").alias("matched_pattern"),
    )


def parse_sitemap(
    df: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Parse sitemap XML (sitemaps.org protocol — the discovery feed
    robots.txt points crawlers at) into flat entries ``(host, entry_idx,
    loc, lastmod, canonical_url, is_index)``.

    Engine spec: entries are split on ``</url>`` (``</sitemap>`` for
    index files), ``<loc>``/``<lastmod>`` extracted per block with
    ``[^<]*`` bodies (portable across Java regex and RE2 — no non-greedy
    scans), blocks without a ``<loc>`` dropped, missing ``<lastmod>`` →
    NULL. ``canonical_url`` applies the frontier's canonicalizer so
    sitemap-discovered URLs join the crawl state on the same key.
    Scan-speed split + regex algebra, one posexplode — no shuffle."""
    xml = F.coalesce(_col(xml_col), F.lit(""))
    is_index = xml.contains("<sitemapindex")
    blocks = F.when(
        is_index, F.split(xml, "</sitemap>")
    ).otherwise(F.split(xml, "</url>"))
    exploded = df.select(
        F.col(host_col).alias("host"),
        is_index.alias("is_index"),
        F.posexplode(blocks).alias("entry_idx", "_blk"),
    )
    loc = F.regexp_extract("_blk", "<loc>([^<]*)</loc>", 1)
    lastmod = F.regexp_extract("_blk", "<lastmod>([^<]*)</lastmod>", 1)
    return (
        exploded.withColumn("loc", loc)
        .filter(F.col("loc") != F.lit(""))
        .select(
            "host",
            "entry_idx",
            "loc",
            F.when(lastmod == F.lit(""), F.lit(None).cast("string"))
            .otherwise(lastmod)
            .alias("lastmod"),
            canonical_url(F.col("loc")).alias("canonical_url"),
            "is_index",
        )
    )


def sitemap_discovery(
    sitemap_entries: DataFrame,
    crawled: DataFrame,
    crawled_url_col: str = "canonical_url",
) -> DataFrame:
    """URLs a sitemap advertises that the crawl state has never seen —
    the frontier's discovery feed: anti-join sitemap canonical URLs
    against the crawled set on the shared canonical key. Returns
    ``(host, canonical_url, lastmod)``, deduped keep-first by entry
    order within a sitemap.

    One anti-join on the canonical key (AQE sizes the crawled side);
    per-host sitemap cardinality is protocol-capped (50k entries), so
    the left side is dimension-like."""
    seen = crawled.select(
        F.col(crawled_url_col).alias("canonical_url")
    ).distinct()
    # keep-first election as ONE map-side-partial groupBy: entry_idx is
    # unique within a host's sitemap, so the struct-min picks exactly
    # the min-entry_idx row and carries its lastmod along — same result
    # as the r8-build groupBy-min + equi-join-back, with the entries
    # subtree referenced (planned, executed) once instead of twice
    # (optimization r8)
    ordered = sitemap_entries.groupBy("host", "canonical_url").agg(
        F.min(F.struct("entry_idx", "lastmod"))["lastmod"].alias("lastmod")
    )
    return ordered.join(seen, "canonical_url", "left_anti")


# full anchor element with a non-markup body — group 1 = href target,
# group 2 = the anchor text (the relevance signal web search has used
# since Brin & Page 1998 §2.2 / Craswell et al. 2001)
ANCHOR_ELEM_PAT = '<[aA][^>]*\\shref="([^"]*)"[^>]*>([^<]*)</[aA]>'


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve HTTP-redirect chains (301/302/canonical-link hops) to
    their final destination by pointer doubling: ``log2(max_hops)``
    self-joins instead of ``max_hops`` sequential ones — the standard
    parallel list-ranking recurrence (Wyllie 1979; cf. the large-star/
    small-star trick in operators/dedup.py's connected components).

    Input: one row per redirect edge ``(src_col, dst_col)``. A URL with
    several recorded targets (re-crawls disagreeing) deterministically
    keeps ``min(dst)``. Output: one row per redirecting URL —
    ``(url, final_url, hops, resolved)`` where ``final_url`` is the
    first non-redirecting target, ``hops`` counts edges walked, and
    ``resolved`` is false for cycles and for chains longer than
    ``max_hops`` (the "too many redirects" verdict every HTTP client
    enforces; both leave ``final_url``/``hops`` NULL).

    Scale shape: state is one row per redirecting URL; each round is a
    single equi-join shuffle on the reach key (AQE-splittable — no
    window, no collect) and a node already at a terminal passes through
    the left join untouched. ``localCheckpoint`` per round truncates the
    doubled lineage exactly as the connected-components loop does."""
    import math

    # malformed edges (NULL src or dst — a redirect with no Location
    # target) are ignored up front: a NULL dst would otherwise win the
    # min() election and read as a "resolved to NULL" verdict
    ptr = (
        edges.filter(
            _col(src_col).isNotNull() & _col(dst_col).isNotNull()
        )
        .groupBy(F.col(src_col).alias("url"))
        .agg(F.min(dst_col).alias("reach"))
        .withColumn("hops", F.lit(1).cast("long"))
    )
    srcs = ptr.select(F.col("url").alias("_s"))
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        nxt = ptr.select(
            F.col("url").alias("_ju"),
            F.col("reach").alias("_jr"),
            F.col("hops").alias("_jh"),
        )
        ptr = (
            ptr.join(nxt, ptr["reach"] == nxt["_ju"], "left")
            .select(
                "url",
                F.coalesce("_jr", "reach").alias("reach"),
                (
                    F.col("hops") + F.coalesce("_jh", F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
    done = ptr.join(srcs, ptr["reach"] == srcs["_s"], "left")
    ok = F.col("_s").isNull() & (F.col("hops") <= F.lit(max_hops))
    return done.select(
        "url",
        F.when(ok, F.col("reach")).alias("final_url"),
        F.when(ok, F.col("hops")).otherwise(
            F.lit(None).cast("long")
        ).alias("hops"),
        ok.alias("resolved"),
    )


def anchor_term_profile(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    k: int = 5,
) -> DataFrame:
    """Per-target-host anchor-text term profile: what OTHER hosts' links
    call this host — the classic off-page relevance/quality signal
    (Brin & Page 1998 §2.2; Craswell et al. 2001 showed anchor text
    beats page content for site finding). Extracts every
    ``<a href=..>text</a>``, keeps cross-host links only (endorsement,
    not navigation), tokenizes the anchor text (lowercase,
    ``[^a-z0-9]+`` splits), and returns the top-``k`` terms per target
    host: ``(host, term, n_mentions, term_rank)``, ranked by
    ``n_mentions`` desc then term asc. Counts are MENTIONS — a term
    repeated inside one anchor counts each occurrence.

    Scale shape: extraction is scan-speed ``regexp_extract_all`` +
    explode; the groupBy keys on (host, term) — anchor vocabulary per
    host, orders of magnitude below mention count, with map-side partials
    absorbing hot terms. The final window partitions on host over at
    most |host vocab| rows. No UDF, no collect."""
    src = canonical_host(url_col)
    elems = F.regexp_extract_all(
        F.coalesce(_col(text_col), F.lit("")),
        F.lit(ANCHOR_ELEM_PAT),
        F.lit(0),
    )
    pairs = (
        df.select(src.alias("src_host"), F.explode(elems).alias("_a"))
        .select(
            "src_host",
            canonical_host(
                F.regexp_extract("_a", ANCHOR_ELEM_PAT, 1)
            ).alias("host"),
            F.lower(
                F.regexp_extract("_a", ANCHOR_ELEM_PAT, 2)
            ).alias("_txt"),
        )
        .filter(
            (F.col("host") != F.lit(""))
            & (F.col("src_host") != F.lit(""))
            & (F.col("host") != F.col("src_host"))
        )
    )
    terms = pairs.select(
        "host",
        F.explode(
            F.filter(
                F.split("_txt", "[^a-z0-9]+"), lambda t: t != F.lit("")
            )
        ).alias("term"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(
        F.col("n_mentions").desc(), F.col("term").asc()
    )
    return (
        terms.groupBy("host", "term")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= F.lit(k))
    )


def host_cap_sample(
    df: DataFrame,
    host_col: str = "host",
    score_col: str = "score",
    id_col: str = "doc_id",
    cap: int = 3,
    n_salts: int = 16,
) -> DataFrame:
    """Per-host document cap: keep the top-``cap`` docs per host by
    ``(score desc, id asc)`` — the domain-cap sampling step pretraining
    pipelines apply so no single site dominates the corpus (cf. Gopher's
    per-domain limits, Rae et al. 2021 §A.2, and RefinedWeb's host-level
    curation, Penedo et al. 2023 §3.1). Adds ``host_rank`` (1-based).

    Exact two-stage top-k so a pathological host never serializes into
    one window task: stage 1 ranks within ``(host, salt)`` — salt =
    md5(id) mod ``n_salts`` — and keeps ``cap`` per salt (the global
    per-host top-``cap`` is necessarily inside the union of per-salt
    top-``cap``s); stage 2 re-ranks the ≤ ``cap·n_salts`` survivors per
    host. Both windows are bounded: stage 1 by the salt fan-out, stage 2
    by ``cap·n_salts`` rows per host."""
    from pyspark.sql import Window

    idc = F.col(id_col)
    salt = (
        F.conv(F.substring(F.md5(idc.cast("string")), 1, 4), 16, 10)
        .cast("long") % F.lit(n_salts)
    )
    order = [F.col(score_col).desc(), idc.asc()]
    w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order)
    pre = (
        df.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.lit(cap))
        .drop("_r1")
    )
    w2 = Window.partitionBy(host_col).orderBy(*order)
    return (
        pre.withColumn("host_rank", F.row_number().over(w2))
        .filter(F.col("host_rank") <= F.lit(cap))
    )


def surt_key(url: Column | str) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the sort/
    lookup key of the Internet Archive wayback index and Common Crawl's
    cc-index): reversed comma-joined host labels, then ``)``, then the
    canonical path and query, e.g. ``com,example)/cat1/item2?page=0``.
    Rows from one registrable domain become one contiguous key range —
    the property that lets a 100 TB URL index range-partition by site.

    Owned subset of the classic spec: host is :func:`canonical_host`
    (lowercased, one ``www.`` stripped, port dropped — a host-level
    key), path/query are the canonicalizer's forms (tracking params out,
    survivors byte-sorted), fragment dropped. Schemeless/NULL input
    falls back to the raw string exactly like :func:`canonical_url`.
    Pure Catalyst string algebra — scan-speed, no UDF."""
    rev = F.array_join(
        F.reverse(F.split(canonical_host(url), "\\.")), ","
    )
    return F.when(url_scheme(url) == F.lit(""), _col(url)).otherwise(
        F.concat(rev, F.lit(")"), _canonical_path(url), _canonical_query(url))
    )


# WARC text-record subset (ISO 28500 / WARC 1.0 — the container Common
# Crawl ships): every record is
#   WARC/1.0\r\n  <headers: "Name: value\r\n" lines>  \r\n
#   <payload bytes>  \r\n\r\n
# Engine subset contract (documented; the synthesis fixtures honor it):
# text records only, each record INCLUDING the last ends with the 4-char
# separator, and payloads never contain the version line. Real
# Content-Length-delimited binary WARC needs a byte-offset reader at the
# source layer; this operator is the record/header algebra on top.
WARC_VERSION_PAT = "WARC/1\\.0\r\n"


def parse_warc(
    df: DataFrame,
    file_col: str = "file_id",
    text_col: str = "warc_text",
) -> DataFrame:
    """Parse concatenated WARC text records (subset spec above) into
    ``(file_id, record_idx, warc_type, target_uri, warc_date,
    content_length, payload, length_ok)``.

    ``length_ok`` cross-checks the declared ``Content-Length`` against
    the actual payload length — the integrity signal a crawl-ingest
    pipeline uses to quarantine truncated records. Split + header
    regexes + substring arithmetic: scan-speed, one posexplode, the only
    shuffle the bounded per-file record-index window. No UDF."""
    from pyspark.sql import Window

    blocks = F.split(
        F.coalesce(_col(text_col), F.lit("")), WARC_VERSION_PAT, -1
    )
    ex = df.select(
        F.col(file_col).alias("file_id"),
        F.posexplode(blocks).alias("_i", "_blk"),
    ).filter(F.col("_blk") != F.lit(""))
    w = Window.partitionBy("file_id").orderBy("_i")
    hdr_end = F.instr(F.col("_blk"), "\r\n\r\n")
    headers = F.col("_blk").substr(F.lit(1), hdr_end - 1)
    body = F.col("_blk").substr(
        hdr_end + 4, F.length("_blk") - hdr_end - 3
    )
    payload = body.substr(F.lit(1), F.length(body) - 4)

    def hval(name):
        raw = F.regexp_extract(headers, name + ": ([^\r\n]*)", 1)
        return F.when(raw == F.lit(""), F.lit(None).cast("string")).otherwise(raw)

    clen = hval("Content-Length").cast("long")
    return ex.select(
        "file_id",
        (F.row_number().over(w) - 1).alias("record_idx"),
        hval("WARC-Type").alias("warc_type"),
        hval("WARC-Target-URI").alias("target_uri"),
        hval("WARC-Date").alias("warc_date"),
        clen.alias("content_length"),
        payload.alias("payload"),
        F.coalesce(F.length(payload) == clen, F.lit(False)).alias(
            "length_ok"
        ),
    )


# ---------------------------------------------------------------------------
# Crawler-trap detection + DUST rule mining
# ---------------------------------------------------------------------------

# query-parameter keys that carry per-visitor session state, never content
SESSION_PARAM_KEYS = (
    "sessionid", "session_id", "sid", "phpsessid", "jsessionid",
    "cfid", "cftoken", "zenid", "oscsid",
)

# a yyyy / yyyy-mm / yyyy-mm-dd path segment (calendar-navigation pages)
_DATE_SEG_PAT = r"^\d{4}(-\d{2}){0,2}$"

# a long hex blob (session tokens, cache-busting hashes) as a param value
_HEX_VALUE_PAT = r"^[0-9a-fA-F]{32,}$"


def _raw_path_segments(url: Column | str) -> Column:
    """Path segments of the RAW url (traps are pre-canonicalization
    signals — collapsing doubled slashes would hide exactly the
    malformed repetition a trap detector looks for). Empty segments
    from doubled slashes are dropped. Schemeless input is treated as a
    relative reference (RFC 3986 §4.2): the whole pre-``?`` part is the
    path, so trap flags still fire on relative frontier entries; NULL
    yields an empty array via the coalesce."""
    u = F.coalesce(_col(url), F.lit(""))
    absolute = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    relative = F.regexp_extract(u, r"^([^?#]*)", 1)
    path = F.when(
        u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://"), absolute
    ).otherwise(relative)
    return F.filter(F.split(path, "/"), lambda s: s != F.lit(""))


def _raw_query_params(url: Column | str) -> Column:
    """``key=value`` strings of the RAW query, order preserved, empty
    params from ``&&`` dropped. NO tracking-param removal: trap
    detection and DUST mining inspect exactly the params the
    canonicalizer would later judge."""
    qs = F.regexp_extract(F.coalesce(_col(url), F.lit("")), r"\?([^#]*)", 1)
    return F.filter(F.split(qs, "&"), lambda p: p != F.lit(""))


def url_trap_flags(
    df: DataFrame,
    url_col: str = "url",
    max_depth: int = 8,
    max_params: int = 8,
    max_query_len: int = 128,
) -> DataFrame:
    """Crawler-trap / spider-trap heuristics (cf. the spam- and
    trap-avoidance machinery in IRLbot, Lee et al. 2009 §7, and
    Heritrix's pathological-URI rules): per-URL boolean signals a
    frontier uses to deprioritize or drop infinite URL spaces BEFORE
    fetching. No analog in the reference. Adds:

      * ``deep_path``      — more than ``max_depth`` path segments
      * ``repeated_segments`` — some path segment appears ≥ 3 times
        (cycle traps: ``/a/b/a/b/a/b`` from relative-link loops)
      * ``calendar_trap``  — ≥ 2 date-like segments (``yyyy[-mm[-dd]]``,
        infinite calendar navigation)
      * ``session_param``  — a session-state param key
        (:data:`SESSION_PARAM_KEYS`) or a ≥ 32-hex param value
      * ``long_query``     — query longer than ``max_query_len`` chars
        or more than ``max_params`` params
      * ``is_trap``        — any of the above

    Scale shape: pure Catalyst string/HOF algebra — scan-speed, no
    shuffle, no UDF (one WholeStageCodegen span); the nested HOF in the
    repeat check is bounded by per-URL segment counts. Schemeless URLs
    are treated as relative references (path + query still inspected);
    NULL URLs produce all-false flags, never NULL flags — downstream
    filters can rely on the booleans.
    """
    segs = _raw_path_segments(url_col)
    params = _raw_query_params(url_col)
    qs = F.regexp_extract(
        F.coalesce(_col(url_col), F.lit("")), r"\?([^#]*)", 1
    )
    key_of = lambda p: F.lower(F.regexp_extract(p, r"^([^=]*)", 1))
    val_of = lambda p: F.regexp_extract(p, r"^[^=]*=(.*)$", 1)
    session_keys = F.array(*[F.lit(k) for k in SESSION_PARAM_KEYS])
    return (
        df.withColumn("deep_path", F.size(segs) > max_depth)
        .withColumn(
            "repeated_segments",
            F.exists(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)) >= 3,
            ),
        )
        .withColumn(
            "calendar_trap",
            F.size(F.filter(segs, lambda s: s.rlike(_DATE_SEG_PAT))) >= 2,
        )
        .withColumn(
            "session_param",
            F.exists(
                params,
                lambda p: F.array_contains(session_keys, key_of(p))
                | val_of(p).rlike(_HEX_VALUE_PAT),
            ),
        )
        .withColumn(
            "long_query",
            (F.length(qs) > max_query_len) | (F.size(params) > max_params),
        )
        .withColumn(
            "is_trap",
            F.col("deep_path")
            | F.col("repeated_segments")
            | F.col("calendar_trap")
            | F.col("session_param")
            | F.col("long_query"),
        )
    )


def host_trap_rollup(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host trap pressure: the share of a host's URLs tripping each
    trap heuristic — the signal a frontier uses to throttle WHOLE hosts
    whose URL space looks infinite (IRLbot budgets hosts, not URLs).
    One map-side-partial groupBy on the canonical host over the
    scan-speed flags of :func:`url_trap_flags`.

    Returns ``(host, n_urls, n_traps, trap_rate, n_deep, n_repeat,
    n_calendar, n_session, n_long)``; ``trap_rate`` is round-6.
    """
    flagged = url_trap_flags(df, url_col=url_col).withColumn(
        "host", canonical_host(url_col)
    )
    b = lambda c: F.sum(F.col(c).cast("long"))
    return flagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        b("is_trap").alias("n_traps"),
        F.round(
            F.sum(F.col("is_trap").cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("trap_rate"),
        b("deep_path").alias("n_deep"),
        b("repeated_segments").alias("n_repeat"),
        b("calendar_trap").alias("n_calendar"),
        b("session_param").alias("n_session"),
        b("long_query").alias("n_long"),
    )


def dust_param_rules(
    df: DataFrame,
    url_col: str = "url",
    content_col: str = "content_hash",
    min_support: int = 3,
    min_precision: float = 0.95,
) -> DataFrame:
    """DUST rule mining — "Do Not Crawl in the DUST: Different URLs
    with Similar Text" (Bar-Yossef et al. 2007, WWW): discover which
    query-parameter KEYS are content-irrelevant from observed
    ``(url, content_hash)`` pairs, so the canonicalizer's drop-list can
    be LEARNED from the crawl instead of hand-curated (the
    ``utm_*``-style list in :data:`TRACKING_PARAM_PAT` is exactly the
    output this miner converges to).

    Single-pass parameter-substitution variant of the paper's rule
    lattice: for every param occurrence, the URL's *residual* is the
    URL with that one param removed (remaining params byte-sorted, so
    param order never splits a group). An *evidence group* is a
    ``(key, residual)`` bucket observing ≥ 2 DISTINCT values for the
    key; the group is *consistent* when all its URLs share one content
    hash. Per key:

      * ``n_groups`` / ``n_consistent`` — evidence groups, and those
        where every value collision agreed on content
      * ``pairs_supported`` — Σ (distinct values − 1) over consistent
        groups (independent witnesses that swapping the value preserves
        content)
      * ``precision`` — ``n_consistent / n_groups`` (round 6)
      * ``is_rule`` — ``precision ≥ min_precision`` and
        ``pairs_supported ≥ min_support``

    Scale shape: explode ×(params per URL) → one groupBy on
    ``(key, residual)`` (map-side combine; residual keys are
    near-unique so no hot keys) → one tiny groupBy on ``key`` (the key
    axis is vocabulary-sized). Keys never observed with 2 distinct
    values emit no row — absence of evidence, not evidence of absence.
    NULL/query-less URLs contribute no param occurrences and drop out
    up front.
    """
    base = F.regexp_extract(
        F.coalesce(_col(url_col), F.lit("")), r"^([^?#]*)", 1
    )
    params = _raw_query_params(url_col)
    ex = df.select(
        F.col(url_col).alias("_url"),
        F.col(content_col).alias("_content"),
        base.alias("_base"),
        params.alias("_params"),
        F.explode(params).alias("_p"),
    )
    key = F.lower(F.regexp_extract(F.col("_p"), r"^([^=]*)", 1))
    value = F.regexp_extract(F.col("_p"), r"^[^=]*=(.*)$", 1)
    residual = F.concat(
        F.col("_base"),
        F.lit("?"),
        F.array_join(F.array_sort(F.array_remove("_params", F.col("_p"))), "&"),
    )
    occ = ex.select(
        key.alias("param_key"),
        value.alias("_value"),
        residual.alias("_residual"),
        "_content",
    )
    groups = (
        occ.groupBy("param_key", "_residual")
        .agg(
            F.countDistinct("_value").alias("_n_vals"),
            F.countDistinct("_content").alias("_n_content"),
        )
        .filter(F.col("_n_vals") >= 2)
    )
    consistent = F.col("_n_content") == 1
    per_key = groups.groupBy("param_key").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(consistent.cast("long")).alias("n_consistent"),
        F.sum(
            F.when(consistent, F.col("_n_vals") - 1).otherwise(F.lit(0))
        ).alias("pairs_supported"),
        F.round(
            F.sum(consistent.cast("long")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("precision"),
    )
    return per_key.withColumn(
        "is_rule",
        (F.col("precision") >= min_precision)
        & (F.col("pairs_supported") >= min_support),
    )


def recrawl_change_rates(
    visits: DataFrame,
    url_col: str = "url",
    changed_col: str = "changed",
    interval: float = 1.0,
) -> DataFrame:
    """Page change-rate estimation for recrawl scheduling (Cho &
    Garcia-Molina 2003, "Estimating frequency of change", ACM TOIT §4):
    from a per-URL visit log with a boolean change verdict per visit,
    estimate the Poisson change rate with the paper's bias-corrected
    estimator

        λ̂ = −ln((n − X + 0.5) / (n + 0.5)) / I

    (n visits at uniform interval I, X of them observed changed — eq.
    (4.4)'s intuition: the naive X/n underestimates because multiple
    changes between visits collapse into one observation). Freshness
    scheduling is the OTHER axis of the frontier besides politeness
    (frontier_schedule): the crawler revisits high-λ pages first.

    Returns per URL: ``(url, n_visits, n_changes, lambda_x1e9)`` with
    ``lambda_x1e9 = floor(λ̂ · 1e9)`` as int64 — the quantization
    discipline the NB/KN scorers use, so the estimate can ride a value
    hash. Rows with zero visits cannot occur (group keys come from the
    log); an all-changed log (X = n) stays finite thanks to the +0.5
    continuity correction.

    Scale shape: one map-side-partial groupBy on the URL — scan-speed
    over any visit-log volume; the ln is a JVM intrinsic on the
    aggregated row, never per-visit.
    """
    n = F.count(F.lit(1))
    # NULL verdict = visit happened, change unknown -> count as
    # unchanged (a bare sum would go NULL and silently poison lambda;
    # the streaming twin's pandas sum would skip NaN and DIVERGE)
    x = F.sum(F.coalesce(F.col(changed_col), F.lit(False)).cast("long"))
    return visits.groupBy(F.col(url_col).alias("url")).agg(
        n.alias("n_visits"),
        x.alias("n_changes"),
        recrawl_lambda_col(n, x, interval).alias("lambda_x1e9"),
    )


def recrawl_lambda_col(
    n: Column, x: Column, interval: float = 1.0
) -> Column:
    """The λ̂ quantization as a reusable column expression:
    ``floor(−ln((n−x+0.5)/(n+0.5))/I · 1e9)`` as int64. Shared by the
    batch aggregate above and the streaming twin's projection over
    drained counts (streaming/counts.py:streaming_recrawl_counts), so
    both paths quantize through the SAME JVM expression tree — the
    stream keeps only mergeable (n, x) counts in state and λ is a
    stateless projection."""
    lam = -F.log((n - x + F.lit(0.5)) / (n + F.lit(0.5))) / F.lit(
        float(interval)
    )
    return F.floor(lam * 1e9).cast("long")
