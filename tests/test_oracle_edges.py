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
    # round 7 session 2: the new documents-only rows — DSIR weights
    # (NULL text must contribute no evidence), char entropy (empty ->
    # 0.0 not null), the distribution screens (NULL lang/source as a
    # real level; degenerate bins), and the classifier calibration
    # (NULL-text features at the fences)
    "dsir_select_topk", "dsir_gumbel_topk", "text_char_entropy",
    "qa_chi2_independence", "qa_psi_drift",
    "quality_logreg_calibration",
    # the minhash family over degenerate shingle sets (NULL text,
    # [''] from empty/whitespace docs, exact dups)
    "dedup_minhash_calibration", "decontam_minhash",
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


#: events-table edge fixture: NULL values (the KS filter), NULL
#: event_type (dropped from the matrix identically by both engines'
#: null-unsafe joins), equal timestamps (the event_id tiebreak),
#: single-event users (straight to '(end)'), negative values (bin
#: extremes)
EDGE_EVENTS = [
    (1, "2024-01-01 00:00:00", 100, "a", 1.0, None),
    (2, "2024-01-01 00:00:00", 100, "b", None, "{}"),
    (3, "2024-01-01 00:00:01", 100, "a", -5.5, None),
    (4, "2024-01-01 00:00:01", 100, None, 2.25, None),
    (5, "2024-01-01 00:00:02", 200, "b", -5.5, None),
    (6, "2024-01-01 00:00:03", 300, "a", 7.75, None),
    (7, "2024-01-01 00:00:03", 300, "a", 7.75, None),
    # an event literally typed like the terminal sentinel: the spine
    # dedup must keep one '(end)' row per src, never two
    (8, "2024-01-01 00:00:04", 300, "(end)", 0.5, None),
]

EDGE_EVENT_QUERIES = ["qa_ks_drift", "evt_markov_transitions"]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F
    tmp = str(tmp_path_factory.mktemp("edge_events"))
    df = (spark.createDataFrame(
              EDGE_EVENTS,
              "event_id long, ts string, user_id long, "
              "event_type string, value double, props string")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "events.parquet"))
    return tmp


@pytest.fixture(scope="module")
def edge_events_duck(edge_events_dir):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{edge_events_dir}/events.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_oracle_parity(spark, edge_events_dir,
                                   edge_events_duck, name):
    from sequencing_integration_pipeline1_0_spark.plans import catalog
    got = _canon(catalog.Q[name](spark, edge_events_dir).toPandas())
    want = _canon(edge_events_duck.sql(catalog.ORACLE[name]).df())
    assert got == want, f"{name}: engine/oracle diverge on edge events"


#: embeddings-table edge fixture: the all-zero vector, a constant
#: DIMENSION (variance 0 -> the eps guard), extreme magnitudes
#: (decimal(18,6) quantization fences), a negative-heavy vector, and
#: an EMPTY embedding (contributes no rows to any per-dim pass in
#: either engine)
EDGE_EMBEDDINGS = [
    (0, [0.0, 0.0, 0.0, 0.0], 0),
    (1, [1.5, 2.0, -3.25, 0.125], 1),
    (2, [1000.0, -999.5, 0.000001, 2.0], 0),
    (3, [1.5, 2.0, -3.25, 0.125], 1),     # exact dup of 1
    (4, [-1.0, -2.0, -3.0, 0.125], 2),    # dim 3 constant-ish
    (5, [], 0),
    (6, [0.1, 0.2, 0.3, 0.125], 1),
]

EDGE_EMBEDDING_QUERIES = [
    "emb_mahalanobis_outliers", "emb_pca_top_component",
    "emb_remove_top_component", "emb_int8_quantize",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("edge_emb"))
    df = spark.createDataFrame(
        EDGE_EMBEDDINGS,
        "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet"))
    return tmp


@pytest.fixture(scope="module")
def edge_emb_duck(edge_emb_dir):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{edge_emb_dir}/embeddings.parquet/*.parquet'")
    return con


@pytest.mark.parametrize("name", EDGE_EMBEDDING_QUERIES)
def test_edge_embeddings_oracle_parity(spark, edge_emb_dir,
                                       edge_emb_duck, name):
    from sequencing_integration_pipeline1_0_spark.plans import catalog
    got = _canon(catalog.Q[name](spark, edge_emb_dir).toPandas())
    want = _canon(edge_emb_duck.sql(catalog.ORACLE[name]).df())
    assert got == want, f"{name}: engine/oracle diverge on edge embeddings"
