"""Cross-engine EDGE-INPUT harness: run text-family queries AND their
DuckDB oracles over a small synthetic corpus full of the inputs the
driver testdata never ships — NULL text, empty strings,
whitespace-only docs, unicode, heavy repetition — and require exact
agreement. The fixed-testdata hash gate certifies behavior only on
the shipped distribution; three review rounds found null/empty
divergences it could never catch (gopher NULL pass flag, line-dedup
NULL chunking, an ANSI DIVIDE_BY_ZERO on empty text), so this gate
pins the edge contract permanently."""

from __future__ import annotations

import math
import os

import pytest

EDGE_ROWS = [
    (0, "", "en", "web", 0),
    (1, None, "en", "web", 0),
    (2, "   ", "de", "web", 3),
    (3, "the the the the the quick brown fox and that dog", "en", "web", 48),
    (4, "the the the the the quick brown fox and that dog", "en", "book", 48),
    (5, "café — unicode ß text with the and of is",
     "fr", "web", 40),
    (6, "x", "es", "web", 1),
    (7, "a b a b a b a b a b a b", "en", "web", 23),
    # round 5: harder unicode + degenerate-token shapes
    (8, "🙂🙂 emoji 🚀 mixed 中文 text العربية rtl", "en", "web", 38),
    (9, "single" + "x" * 5000 + " giant token doc", "en", "web", 5022),
    (10, "\tleading tab\nand newline   runs\t\t", "de", None, 34),
    (11, "word", None, "web", 4),
]

#: every registered query that reads ONLY `documents` and has a SQL
#: oracle with edge-sensitive text handling
EDGE_QUERIES = [
    "text_gopher_rules", "text_fix_mojibake", "dedup_lines_global",
    "text_remove_repeated_spans", "unigram_doc_score",
    "repeated_span_fraction", "pipe_corpus_curation",
    "text_lang_quality_fingerprint", "text_token_stats",
    "pipe_incremental_corpus", "sample_temperature",
    "quality_linear_classifier", "dedup_url_canonical",
    "text_chunk_windows",
]


def _canon(pdf):
    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("<NULL>")
            elif isinstance(v, float):
                vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("edge_docs"))
    df = spark.createDataFrame(
        EDGE_ROWS,
        "doc_id long, text string, lang string, source string, n_chars long")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet"))
    return tmp


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{edge_dir}/documents.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_oracle_parity(spark, edge_dir, edge_duck, name):
    from sequencing_integration_pipeline1_0_spark.plans import catalog
    got = _canon(catalog.Q[name](spark, edge_dir).toPandas())
    want = _canon(edge_duck.sql(catalog.ORACLE[name]).df())
    assert got == want, f"{name}: engine/oracle diverge on edge corpus"
