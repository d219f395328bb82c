"""Sinks (SURVEY §2.1 S10-S16).

The load-bearing ones re-expressed Spark-first:
  - S10 CSV sink with nulls rendered "" (write option nullValue)
  - S11 chunked sink: <=500-row files (WDRS upload limit,
    ROSTER_COMPILE.Rmd:386-398) — row_number window -> chunk id ->
    partitionBy write; one shuffle, no driver-side slicing
  - S12 append sink + row-count reconciliation
  - S13 partition-by-key output (one dir per lab)
  - S15 versioned snapshot dirs
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite",
              null_as: str = "") -> None:
    """S10: nulls as empty string (quality_filters.R:266-271)."""
    (df.write.mode(mode)
       .option("header", True)
       .option("nullValue", null_as)
       .option("emptyValue", null_as)
       .csv(path))


def add_chunk_id(df: DataFrame, order_cols: Sequence[str],
                 chunk_rows: int = 500, out: str = "chunk") -> DataFrame:
    """S11: deterministic chunk assignment: ceil-division of the global
    row_number. Single global window is acceptable because the roster
    output is post-aggregation small; for 100 TB-scale outputs use
    `approx_chunks` below instead."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        out, ((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_rows)).cast("int"))


def approx_chunks(df: DataFrame, chunk_rows: int = 500) -> DataFrame:
    """Scale-path chunking: per-partition row limits without a global
    window — repartition so each output file holds <= chunk_rows.
    File sizes are <= chunk_rows but not exactly equal (acceptable for
    the <=500 upload contract)."""
    n = df.count()
    parts = max(1, -(-n // chunk_rows))
    return df.repartition(parts)


def write_chunked(df: DataFrame, path: str, order_cols: Sequence[str],
                  chunk_rows: int = 500, mode: str = "overwrite") -> None:
    """S11 end-to-end: exact <=500-row CSV chunks."""
    with_chunk = add_chunk_id(df, order_cols, chunk_rows)
    (with_chunk.repartition("chunk").write.mode(mode)
     .partitionBy("chunk").option("header", True).csv(path))


def write_partitioned(df: DataFrame, path: str, key: str,
                      mode: str = "overwrite") -> None:
    """S13: one output dir per key value (KEEP_NA...Rmd:127-136
    one CSV per lab)."""
    df.write.mode(mode).partitionBy(key).option("header", True).csv(path)


def append_with_reconciliation(df: DataFrame, path: str, *,
                               holding_path: str | None = None,
                               run_tag: str = "batch"
                               ) -> tuple[int, int, int, bool]:
    """S12: append + post-append row-count reconciliation
    (template_submitters.Rmd:961-984). Returns (old, appended, new,
    diverted).

    On mismatch the reference does NOT stop the run: it writes the
    batch to a holding folder for later review/append
    (keep_na/Add_Holding/<name>_<timestamp>.csv, :969-984) — pass
    `holding_path` to get that behavior (the batch lands under
    `holding_path`/`run_tag`/ and diverted=True is returned). Without a
    holding path the mismatch raises, matching the strict template
    paths.

    Reconciliation happens BEFORE the destination append: the batch is
    staged aside, its parsed row count checked, and only a reconciled
    batch is committed — a diverted batch therefore exists ONLY in the
    holding folder, never also in the ledger (append-then-divert would
    double-count every held row on the later review/append)."""
    import shutil
    import tempfile

    spark = df.sparkSession

    def _read(p):
        # multiLine + escape match the writer's quoting, so a field
        # with an embedded newline parses back as ONE row — without
        # them every legal multi-line value would fail reconciliation
        return (spark.read.option("header", True)
                .option("multiLine", True).option("escape", '"').csv(p))

    try:
        old = _read(path).count()
    except Exception:
        old = 0
    appended = df.count()
    stage = tempfile.mkdtemp(prefix="s12_stage_")
    try:
        df.write.mode("overwrite").option("header", True).csv(stage)
        staged = _read(stage)
        staged_n = staged.count()
        if staged_n != appended:
            if holding_path is not None:
                # hold the ORIGINAL rows — the staged parse is the
                # thing that just failed; writing it would corrupt
                # the very batch the review is meant to recover
                df.write.mode("overwrite").option("header", True).csv(
                    f"{holding_path}/{run_tag}")
                return old, appended, old, True
            raise AssertionError(
                f"append reconciliation failed: staged batch parsed as "
                f"{staged_n} rows, expected {appended}")
        staged.write.mode("append").option("header", True).csv(path)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    new = _read(path).count()
    if new != old + appended:
        # destination-level corruption after a verified append — a
        # divert cannot repair this; stop the run
        raise AssertionError(
            f"append reconciliation failed: {old} + {appended} != {new}")
    return old, appended, new, False


def write_bucketed(df: DataFrame, table: str, key: str, *,
                   buckets: int = 16, path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed parquet table: co-locates rows by hash(key) at WRITE
    time so every later equi-join/aggregation on `key` between tables
    bucketed the same way runs shuffle-free — the scan IS the
    exchange. This is the 100 TB answer to the reference's repeated
    accession-key joins (the same WDRS case table is joined every run;
    bucket it once, join it forever).

    Requires saveAsTable (bucket metadata lives in the catalog);
    `path` makes it an external table.
    """
    w = (df.write.mode(mode).format("parquet")
           .bucketBy(buckets, key).sortBy(key))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def _hadoop_fs(spark, path: str):
    """Hadoop FileSystem handle for `path` — works on local fs in tests
    and on HDFS/S3A/ABFS on a real cluster (unlike os.listdir)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def snapshot_versions(spark, root: str) -> list[int]:
    """Existing snapshot versions under `root`, ascending."""
    fs, hpath = _hadoop_fs(spark, root)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                pass
    return sorted(out)


def write_snapshot(df: DataFrame, root: str, version: int | None = None) -> int:
    """S15: versioned parquet snapshot sink (pins::pin_write analog,
    read_all_data.Rmd:98-107) — immutable `v=<n>` dirs under one root.
    Auto-assigns max+1 when version is None; refuses to overwrite an
    existing version (snapshots are append-only history, the property
    the CDC diff operators depend on). Returns the version written."""
    spark = df.sparkSession
    existing = snapshot_versions(spark, root)
    if version is None:
        version = (existing[-1] + 1) if existing else 0
    elif version in existing:
        raise ValueError(f"snapshot v={version} already exists under {root}")
    df.write.mode("errorifexists").parquet(f"{root}/v={version}")
    return version


def read_snapshot(spark, root: str, version: int | None = None) -> DataFrame:
    """Read one snapshot version (default: latest) — the time-travel
    read half of S15."""
    versions = snapshot_versions(spark, root)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {root}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise FileNotFoundError(f"snapshot v={version} not found under {root}")
    return spark.read.parquet(f"{root}/v={version}")


def write_date_partitioned(df: DataFrame, path: str, ts_col: str, *,
                           mode: str = "overwrite",
                           granularity: str = "day") -> None:
    """Layout for time-ranged scans at scale: hive-partition by derived
    date so readers with a date predicate scan only matching
    directories (PartitionFilters — zero I/O for pruned days, the
    dominant access pattern of an append-heavy 100 TB event store).
    `granularity`: 'day' or 'month'."""
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}[granularity]
    (df.withColumn("p_date", F.date_format(F.col(ts_col), fmt))
       .write.mode(mode).partitionBy("p_date").parquet(path))


def compact(spark, path: str, *, target_files: int | None = None,
            target_rows_per_file: int | None = None) -> int:
    """Small-files compaction: rewrite a parquet dir into `target_files`
    (or ceil(rows/target_rows_per_file)) files via round-robin
    repartition. Incremental ingest (streaming micro-batches, per-lab
    drops) accretes tiny files that poison scan parallelism and footer
    time at scale; compaction restores healthy file sizes. Writes to
    `<path>__compact` then swaps via Hadoop FS rename (atomic on HDFS;
    best-effort elsewhere). Returns the file count written."""
    df = spark.read.parquet(path)
    if target_files is None:
        if target_rows_per_file is None:
            raise ValueError("need target_files or target_rows_per_file")
        n = df.count()
        target_files = max(1, -(-n // target_rows_per_file))
    tmp = path.rstrip("/") + "__compact"
    df.repartition(target_files).write.mode("overwrite").parquet(tmp)
    fs, src = _hadoop_fs(spark, tmp)
    dst = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs.delete(dst, True)
    fs.rename(src, dst)
    return len([f for f in fs.listStatus(dst)
                if f.getPath().getName().endswith(".parquet")])


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite",
                compression: str | None = "gzip") -> None:
    """JSON-lines corpus sink (one JSON object per row — the LLM
    training-shard interchange format; pairs with
    ingest.read_jsonl_allstring). Gzip by default: text corpora
    compress ~5-10x and every downstream reader splits per FILE, so
    shard count (df's partitioning), not codec, sets parallelism."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_zordered(df: DataFrame, path: str, zkey_sql: str, *,
                   n_files: int, mode: str = "overwrite") -> None:
    """Z-order-clustered parquet write — the PRODUCTION form of the
    layout `layout_zorder_files` plans (operators/layout.py): compute
    the Morton key (layout.z_interleave_sql(engine='spark')), range-
    partition on it into n_files partitions, sort within each, write.
    Spark's range partitioner samples boundaries, so the shuffle is
    parallel — no global window, no single-task sort; each output
    file's min/max column envelope is what parquet readers prune on.
    File row counts are approximately (not exactly) equal — the
    standard trade a clustered write makes vs the planner's exact
    row_number layout."""
    zed = df.withColumn("__zkey", F.expr(zkey_sql))
    (zed.repartitionByRange(n_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode).parquet(path))
