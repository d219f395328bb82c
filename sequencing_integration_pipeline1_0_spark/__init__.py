"""PySpark-native analytics engine with the query/data-processing
capabilities of NW-PaGe/sequencing_integration_pipeline1.0.

Brand-new Spark-first design (DataFrame/SQL + Catalyst); the reference
(eager single-node R) defines WHAT is computed, not HOW. See SURVEY.md.

Layout:
  functions/  - pure Column-expression builders (cleaning, dates,
                accessions, vocab, validation) - zero Python row-UDFs
  operators/  - DataFrame->DataFrame transforms (dedup windows, fuzzy
                joins, QA-flag engine, aggregates, CDC diffs, scaled
                dedup / similarity / text analysis)
  sources/    - ingestion (all-string CSV with NA normalization +
                provenance) and sinks (chunked, partitioned)
  plans/      - pipeline compositions (template/fuzzy/ELR/compile paths)
  streaming/  - incremental-batch state patterns + Structured Streaming
"""

__version__ = "0.1.0"
