"""Unit tests for the round-5 curation operators: URL canonicalization
dedup (operators/urls.py) and the hashed-unigram linear quality
classifier (textstats.quality_weight_sum / quality_linear_logit).
The oracle gate certifies them on synthesized testdata inputs; these
pin the named semantic rules on hand-picked cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.operators import textstats, urls


CANON_CASES = [
    # lowercase scheme+host, keep path case
    ("HTTP://ExAmPle.COM/Path", "http://example.com/Path"),
    # www + default ports stripped, per scheme
    ("http://www.example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    # non-default port kept; http's default NOT stripped from https
    ("https://example.com:80/a", "https://example.com:80/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # fragment dropped; empty path roots; trailing slash trimmed
    ("http://example.com#frag", "http://example.com/"),
    ("http://example.com/a/b/#x", "http://example.com/a/b"),
    ("http://example.com/", "http://example.com/"),
    # tracking params out, survivors sorted, empty query dropped
    ("http://e.com/p?utm_source=x&b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?fbclid=1&gclid=2&ref=3&utm_medium=m",
     "http://e.com/p"),
    # 'ref' matches only exactly (refresh= survives); bare flag param
    ("http://e.com/p?refresh=1&ref", "http://e.com/p?refresh=1"),
    # a '?' INSIDE the fragment is not a query
    ("http://e.com/p#a/b?c=1", "http://e.com/p"),
    # non-URLs -> NULL (review route)
    ("not a url", None),
    ("", None),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in
                                enumerate(CANON_CASES)], "i int, u string")
    got = dict(df.select("i", urls.canonicalize_url("u").alias("c"))
                 .collect())
    for i, (u, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_dedup_by_canonical_url_groups(spark):
    df = spark.createDataFrame(
        [(1, "http://www.E.com/a?utm_source=x"),
         (2, "HTTP://e.com:80/a"),
         (3, "https://e.com/a"),          # differs by scheme: own group
         (4, "junk"), (5, "junk")],       # non-URLs: each keeps itself
        "doc_id int, url string")
    out = {r["doc_id"]: r for r in
           urls.dedup_by_canonical_url(df, "url", "doc_id").collect()}
    assert out[1]["canon_url"] == out[2]["canon_url"] == "http://e.com/a"
    assert (out[1]["kept"], out[2]["kept"]) == (1, 0)
    assert out[1]["group_n"] == 2
    assert out[3]["kept"] == 1 and out[3]["group_n"] == 1
    assert out[4]["canon_url"] is None
    assert out[4]["kept"] == 1 and out[5]["kept"] == 1
    assert out[4]["group_n"] == 1 and out[5]["group_n"] == 1


def test_quality_logit_properties(spark):
    """The logit is the mean lattice weight: word-order invariant,
    repetition-invariant for a single word, bounded by the lattice,
    and the sign test equals thresholding sigmoid at 0.5."""
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"),
         (2, "alpha"), (3, "alpha alpha alpha alpha"),
         (4, "")],
        "i int, t string")
    rows = dict(df.select(
        "i",
        F.struct(
            textstats.quality_linear_logit("t").alias("z"),
            textstats.quality_weight_sum("t").alias("s"),
        ).alias("r")).collect())
    half = textstats.QUALITY_WEIGHT_DENOM // 2
    # order invariance
    assert rows[0]["z"] == rows[1]["z"]
    # repeating one word never moves its mean weight
    assert rows[2]["z"] == rows[3]["z"]
    for r in rows.values():
        assert -0.5 <= r["z"] < 0.5
        assert -half <= r["s"] < half or r["s"] >= half * -4  # sane sum
        assert (r["s"] >= 0) == (r["z"] >= 0)
    # empty text: one ''-token document, still scored, never a crash
    assert rows[4]["z"] is not None


def test_quality_weight_sum_is_exact_integer(spark):
    df = spark.createDataFrame([(0, "the quick brown fox " * 50)],
                               "i int, t string")
    [[s]] = df.select(textstats.quality_weight_sum("t")).collect()
    assert isinstance(s, int)


def test_chunk_token_windows_shapes(spark):
    """Window/stride semantics: starts at 0, stride, ... while inside
    the doc; trailing window runs short; every token is covered; the
    overlap region is exactly window - stride tokens."""
    doc = " ".join(f"t{i}" for i in range(300))
    df = spark.createDataFrame([(0, doc), (1, "a b c"), (2, "")],
                               "i int, t string")
    out = (df.select("i", F.explode(
               textstats.chunk_token_windows("t", window=128, stride=96))
               .alias("c"))
             .select("i", "c.*").collect())
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["i"], []).append(r)
    # 300 tokens, starts 0/96/192/288 -> 4 chunks, last runs short
    c0 = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    assert [r["chunk_start"] for r in c0] == [0, 96, 192, 288]
    assert [r["chunk_len"] for r in c0] == [128, 128, 108, 12]
    assert c0[0]["chunk_text"].split()[0] == "t0"
    assert c0[-1]["chunk_text"].split() == [f"t{i}" for i in
                                            range(288, 300)]
    # overlap: chunk k shares its first window-stride tokens with k-1
    assert c0[1]["chunk_text"].split()[:32] == \
        c0[0]["chunk_text"].split()[96:]
    # short doc: one chunk, full doc
    [c1] = by_doc[1]
    assert (c1["chunk_start"], c1["chunk_len"],
            c1["chunk_text"]) == (0, 3, "a b c")
    # empty doc: the ['']-token contract -> one 1-token chunk
    [c2] = by_doc[2]
    assert (c2["chunk_len"], c2["chunk_text"]) == (1, "")


def test_chunk_token_windows_validates_geometry():
    with pytest.raises(ValueError):
        textstats.chunk_token_windows("t", window=0)
    with pytest.raises(ValueError):
        textstats.chunk_token_windows("t", stride=0)
