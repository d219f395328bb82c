"""Source/sink operators that the oracle gate can't cover (SURVEY §2.1):
S1 all-string CSV read + NA vocabulary + provenance, S6 extension
registry, S7 latest-per-dir, S10 null-as-empty CSV sink, S11 chunked
sink, S12 append reconciliation, S13 partition-by-key sink."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.sources import ingest, sinks


@pytest.fixture()
def csv_dir(tmp_path):
    """Two lab-submission CSVs with dirty NA strings."""
    a = tmp_path / "lab_a"
    b = tmp_path / "lab_b"
    a.mkdir()
    b.mkdir()
    (a / "batch1.csv").write_text(
        "LAB_ACCESSION_ID,FIRST_NAME,DOB\n"
        "ACC1,ALICE,01/02/2021\n"
        "ACC2,NA,N/A\n"
        "ACC3,None,44197\n")
    (b / "batch2.csv").write_text(
        "LAB_ACCESSION_ID,FIRST_NAME,DOB\n"
        "ACC4,BOB,2021-03-04\n"
        ",null,\n")
    return tmp_path


def test_s1_allstring_na_provenance(spark, csv_dir):
    paths = sorted(glob.glob(os.path.join(str(csv_dir), "*", "*.csv")))
    df = ingest.read_csv_allstring(spark, paths)
    # all ingested columns are strings
    assert all(dt == "string" for _, dt in df.dtypes)
    rows = {r["LAB_ACCESSION_ID"]: r for r in df.collect()}
    assert len(rows) == 5 or None in rows  # 5 data rows incl. the null-key one
    # NA vocabulary -> NULL
    assert rows["ACC2"]["FIRST_NAME"] is None
    assert rows["ACC2"]["DOB"] is None
    assert rows["ACC3"]["FIRST_NAME"] is None
    assert rows["ACC3"]["DOB"] == "44197"  # Excel serial survives as string
    # provenance column carries the source file
    assert rows["ACC1"]["index"].endswith("batch1.csv")
    assert rows["ACC4"]["index"].endswith("batch2.csv")


def test_s6_reader_registry(spark, tmp_path):
    (tmp_path / "t.tsv").write_text("a\tb\nx\tNA\n")
    df = ingest.read_any(spark, str(tmp_path / "t.tsv"))
    r = df.collect()[0]
    assert r["a"] == "x" and r["b"] is None
    with pytest.raises(ValueError):
        ingest.read_any(spark, str(tmp_path / "t.unknown"))


def test_s7_latest_file_per_dir(spark, tmp_path):
    for d, files in {"lab_a": ["old.csv", "new.csv"], "lab_b": ["only.csv"]}.items():
        (tmp_path / d).mkdir()
        for i, f in enumerate(files):
            p = tmp_path / d / f
            p.write_text("x\n")
            os.utime(p, (1000 + i, 1000 + i))
    latest = ingest.latest_file_per_dir(spark, str(tmp_path), "*.csv")
    got = {os.path.basename(r["dir"]): os.path.basename(r["path"])
           for r in latest.collect()}
    assert got == {"lab_a": "new.csv", "lab_b": "only.csv"}


def test_s10_null_as_empty(spark, tmp_path, sf_dir):
    df = spark.createDataFrame([("a", None), (None, "b")], "x string, y string")
    out = str(tmp_path / "out")
    sinks.write_csv(df, out)
    lines = []
    for p in glob.glob(os.path.join(out, "*.csv")):
        with open(p) as fh:
            lines += [ln.strip() for ln in fh if ln.strip() and ln.strip() != "x,y"]
    assert sorted(lines) == ["a,", ",b"] or sorted(lines) == [",b", "a,"]


def test_s11_chunked_sink(spark, tmp_path, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")) \
        .select("o_orderkey")
    n = o.count()
    out = str(tmp_path / "chunks")
    sinks.write_chunked(o, out, ["o_orderkey"], chunk_rows=500)
    total = 0
    for d in glob.glob(os.path.join(out, "chunk=*")):
        rows = sum(
            sum(1 for ln in open(p) if ln.strip() and ln.strip() != "o_orderkey")
            for p in glob.glob(os.path.join(d, "*.csv")))
        assert rows <= 500
        total += rows
    assert total == n  # conservation: every row lands in exactly one chunk


def test_s12_append_reconciliation(spark, tmp_path):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    path = str(tmp_path / "ledger")
    old, app, new, div = sinks.append_with_reconciliation(df, path)
    assert (old, app, new, div) == (0, 2, 2, False)
    old, app, new, div = sinks.append_with_reconciliation(df, path)
    assert (old, app, new, div) == (2, 2, 4, False)


def test_s12_mismatch_diverts_to_holding(spark, tmp_path, monkeypatch):
    """On reconciliation mismatch the batch lands in the holding folder
    instead of raising (template_submitters.Rmd:969-984)."""
    df = spark.createDataFrame([(1,), (2,)], "k int")
    path = str(tmp_path / "ledger")
    holding = str(tmp_path / "holding")
    sinks.append_with_reconciliation(df, path)   # seed the ledger
    # force a mismatch: make the post-append count read lie
    real_count = type(df).count
    state = {"n": 0, "lie_on": 3}  # ledger exists: 3rd count = post-append

    def lying_count(self):
        state["n"] += 1
        n = real_count(self)
        return n + 1 if state["n"] == state["lie_on"] else n

    monkeypatch.setattr(type(df), "count", lying_count)
    old, app, new, div = sinks.append_with_reconciliation(
        df, path, holding_path=holding, run_tag="t1")
    monkeypatch.undo()
    assert div is True
    held = spark.read.option("header", True).csv(f"{holding}/t1")
    assert held.count() == 2
    # without a holding path the same mismatch raises; fresh ledger so
    # the pre-read fails -> counts are (appended, post-append) = lie on 2
    state.update(n=0, lie_on=2)
    monkeypatch.setattr(type(df), "count", lying_count)
    with pytest.raises(AssertionError):
        sinks.append_with_reconciliation(df, str(tmp_path / "l2"))


def test_s13_partitioned_sink(spark, tmp_path, sf_dir):
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")) \
        .select("c_custkey", "c_mktsegment")
    out = str(tmp_path / "by_seg")
    sinks.write_partitioned(c, out, "c_mktsegment")
    segs = {os.path.basename(d).split("=", 1)[1]
            for d in glob.glob(os.path.join(out, "c_mktsegment=*"))}
    expected = {r["c_mktsegment"] for r in
                c.select("c_mktsegment").distinct().collect()}
    assert segs == expected


def test_bucketed_join_is_shuffle_free(spark, tmp_path, sf_dir):
    """Two tables bucketed on the join key: the equi-join plan must
    contain no Exchange (the bucketed scan provides the partitioning)."""
    from sequencing_integration_pipeline1_0_spark.sources import sinks
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    sinks.write_bucketed(o, "b_orders", "o_orderkey",
                         buckets=4, path=str(tmp_path / "bo"))
    sinks.write_bucketed(li, "b_lineitem", "o_orderkey",
                         buckets=4, path=str(tmp_path / "bl"))
    # force a non-broadcast plan so the bucketing (not broadcast) must
    # eliminate the shuffle — at real scale neither side broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_lineitem"),
                                         "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_snapshot_versioning_roundtrip(spark, tmp_path):
    """S15: auto-versioned immutable snapshot dirs + time-travel read."""
    from sequencing_integration_pipeline1_0_spark.sources import sinks
    root = str(tmp_path / "snaps")
    v0_df = spark.range(5).withColumn("tag", F.lit("old"))
    v1_df = spark.range(7).withColumn("tag", F.lit("new"))
    assert sinks.write_snapshot(v0_df, root) == 0
    assert sinks.write_snapshot(v1_df, root) == 1
    assert sinks.snapshot_versions(spark, root) == [0, 1]
    assert sinks.read_snapshot(spark, root).count() == 7          # latest
    old = sinks.read_snapshot(spark, root, version=0)
    assert old.count() == 5
    assert old.select("tag").distinct().collect()[0]["tag"] == "old"
    # immutability: an existing version must refuse to be rewritten
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sinks.write_snapshot(v0_df, root, version=1)
    with _pytest.raises(FileNotFoundError):
        sinks.read_snapshot(spark, root, version=9)


def test_date_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    """A date predicate on a date-partitioned layout must become a
    PartitionFilter (directory pruning), not a row filter."""
    from sequencing_integration_pipeline1_0_spark.sources import sinks
    from sequencing_integration_pipeline1_0_spark.plans.catalog import _t
    e = (_t(spark, sf_dir, "events")
         .withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
         .drop("ts_us"))
    root = str(tmp_path / "by_day")
    sinks.write_date_partitioned(e, root, "event_time", granularity="day")
    days = sorted(r["p_date"] for r in
                    spark.read.parquet(root).select("p_date").distinct().collect())
    assert len(days) > 1
    one = spark.read.parquet(root).filter(F.col("p_date") == days[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "p_date" in pf_line
    # pruned read returns exactly that month's rows
    expected = (spark.read.parquet(root)
                .filter(F.date_format("event_time", "yyyy-MM-dd") == days[0])
                .count())
    assert one.count() == expected > 0


def test_compact_restores_file_count_and_data(spark, sf_dir, tmp_path):
    from sequencing_integration_pipeline1_0_spark.sources import sinks
    path = str(tmp_path / "frag")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o.repartition(20).write.parquet(path)
    import glob as g
    assert len(g.glob(path + "/*.parquet")) == 20
    n_before = o.count()
    files = sinks.compact(spark, path, target_files=3)
    assert files == 3
    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert {r["o_orderkey"] for r in after.select("o_orderkey").collect()} == \
           {r["o_orderkey"] for r in o.select("o_orderkey").collect()}


def test_xlsx_cell_range_parsing():
    from sequencing_integration_pipeline1_0_spark.sources.ingest import (
        col_letters_to_idx, parse_cell_range)
    assert col_letters_to_idx("A") == 0
    assert col_letters_to_idx("F") == 5
    assert col_letters_to_idx("Z") == 25
    assert col_letters_to_idx("AA") == 26
    assert col_letters_to_idx("AB") == 27
    assert parse_cell_range("A:F") == (0, 5, None, None)
    assert parse_cell_range("B2:D10") == (1, 3, 2, 10)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_cell_range("A1:F")       # mixed forms
    with _pytest.raises(ValueError):
        parse_cell_range("1:6")        # not letters


def _write_xlsx(path, sheets):
    """Minimal ECMA-376 SpreadsheetML writer (stdlib zipfile, test
    fixture only): sheets = [(name, rows, inline)] with rows of
    str/int/float/None. inline=True stores strings as inlineStr cells,
    inline=False routes them through sharedStrings.xml — covering both
    decode paths of ingest._xlsx_sheet_rows."""
    import zipfile
    from xml.sax.saxutils import escape

    def colref(ci, r):
        letters, ci = "", ci + 1
        while ci:
            ci, rem = divmod(ci - 1, 26)
            letters = chr(65 + rem) + letters
        return f"{letters}{r}"

    shared, sidx = [], {}

    def sid(s):
        if s not in sidx:
            sidx[s] = len(shared)
            shared.append(s)
        return sidx[s]

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    relns = "http://schemas.openxmlformats.org/package/2006/relationships"
    sheet_members = []
    for name, rows, inline in sheets:
        body = []
        for ri, row in enumerate(rows, start=1):
            cells = []
            for ci, v in enumerate(row):
                if v is None:
                    continue
                ref = colref(ci, ri)
                if isinstance(v, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                elif inline:
                    cells.append(f'<c r="{ref}" t="inlineStr">'
                                 f"<is><t>{escape(str(v))}</t></is></c>")
                else:
                    cells.append(f'<c r="{ref}" t="s">'
                                 f"<v>{sid(str(v))}</v></c>")
            body.append(f'<row r="{ri}">{"".join(cells)}</row>')
        sheet_members.append(
            f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>')
    wb_sheets = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, (n, _, _) in enumerate(sheets))
    wb = (f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}">'
          f"<sheets>{wb_sheets}</sheets></workbook>")
    rels = "".join(
        f'<Relationship Id="rId{i+1}" Type="{rns}/worksheet" '
        f'Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(len(sheets)))
    rels = (f'<?xml version="1.0"?><Relationships xmlns="{relns}">{rels}'
            f'<Relationship Id="rIdSS" Type="{rns}/sharedStrings" '
            f'Target="sharedStrings.xml"/></Relationships>')
    sst = "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
    sst = (f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(shared)}" '
           f'uniqueCount="{len(shared)}">{sst}</sst>')
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
                   f'<?xml version="1.0"?><Types xmlns="http://schemas.'
                   f'openxmlformats.org/package/2006/content-types"/>')
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        for i, m in enumerate(sheet_members):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", m)


def test_xlsx_roundtrip_with_sheet_and_range(spark, tmp_path):
    """S2 round-trip, fully live (stdlib reader, no openpyxl): write a
    2-sheet workbook, read the named sheet through a column range,
    check contract reindex + NA normalization + provenance
    (SGTF_template_matching.Rmd:64-66 semantics)."""
    from sequencing_integration_pipeline1_0_spark.sources import ingest
    p = str(tmp_path / "sub.xlsx")
    _write_xlsx(p, [
        ("Other", [["X"], [9]], True),                    # inlineStr path
        ("Linelist", [
            ["LAB_ACCESSION_ID", "SPECIMEN_COLLECTION_DATE", "FIRST_NAME",
             "LAST_NAME", "MIDDLE_NAME", "DOB", "EXTRA_BEYOND_RANGE"],
            ["L1", "2024-01-02", "ann", "lee", None, "1980-01-15", "drop"],
            ["L2", "N/A", "", "wu", "q", "1990-02-20", "me"],
        ], False),                                        # sharedStrings path
    ])
    cols = ["LAB_ACCESSION_ID", "SPECIMEN_COLLECTION_DATE", "FIRST_NAME",
            "LAST_NAME", "MIDDLE_NAME", "DOB"]
    out = ingest.read_xlsx(spark, [p], columns=cols, sheet="Linelist",
                           cell_range="A:F")
    rows = {r["LAB_ACCESSION_ID"]: r for r in out.collect()}
    assert set(out.columns) == {*cols, "index"}
    assert len(rows) == 2
    assert rows["L2"]["SPECIMEN_COLLECTION_DATE"] is None   # NA vocab
    assert rows["L1"]["MIDDLE_NAME"] is None                # absent cell
    assert rows["L2"]["MIDDLE_NAME"] == "q"
    assert rows["L1"]["index"].endswith("sub.xlsx")         # provenance
    # sheet addressed by position + numeric cell read as its raw text
    other = ingest.read_any(spark, p, sheet="Other")
    assert [r["X"] for r in other.collect()] == ["9"]
    # unknown sheet name fails loudly with the available names (the
    # ValueError surfaces wrapped in Spark's executor PythonException)
    with pytest.raises(Exception, match="Linelist"):
        ingest.read_xlsx(spark, [p], columns=cols, sheet="Nope").collect()


def test_s12_multiline_field_reconciles_and_appends(spark, tmp_path):
    """A batch with a legal quoted embedded newline must reconcile
    (stage re-read uses multiLine+escape to match the writer) and
    append — regression for the always-divert bug."""
    df = spark.createDataFrame(
        [("1", "line one\nline two"), ("2", "plain")], "k string, txt string")
    path = str(tmp_path / "ml_ledger")
    old, app, new, div = sinks.append_with_reconciliation(df, path)
    assert (old, app, new, div) == (0, 2, 2, False)
    back = (spark.read.option("header", True)
            .option("multiLine", True).option("escape", '"').csv(path))
    got = {r["k"]: r["txt"] for r in back.collect()}
    assert got == {"1": "line one\nline two", "2": "plain"}


def test_s12_divert_holds_original_rows(spark, tmp_path, monkeypatch):
    """The holding folder must receive the ORIGINAL batch rows, not
    the failed staged parse."""
    df = spark.createDataFrame(
        [("1", "alpha"), ("2", "beta")], "k string, txt string")
    path = str(tmp_path / "dv_ledger")
    holding = str(tmp_path / "dv_holding")
    sinks.append_with_reconciliation(df, path)      # seed
    real_count = type(df).count
    state = {"n": 0}

    def lying_count(self):
        state["n"] += 1
        n = real_count(self)
        return n + 1 if state["n"] == 3 else n      # staged count lies

    monkeypatch.setattr(type(df), "count", lying_count)
    old, app, new, div = sinks.append_with_reconciliation(
        df, path, holding_path=holding, run_tag="orig")
    monkeypatch.undo()
    assert div is True
    held = (spark.read.option("header", True)
            .option("multiLine", True).option("escape", '"')
            .csv(f"{holding}/orig"))
    assert sorted((r["k"], r["txt"]) for r in held.collect()) == \
        [("1", "alpha"), ("2", "beta")]


def test_xlsx_blank_row_and_duplicate_headers(spark, tmp_path):
    """A fully-empty sheet row (omitted from the XML entirely, as
    Excel writes them) must still occupy its row position so
    header/skiprows alignment matches what the spreadsheet SHOWS;
    duplicate header labels mangle pandas-style ('A', 'A.1') instead
    of crashing the contract reindex."""
    import zipfile
    from sequencing_integration_pipeline1_0_spark.sources import ingest
    p2 = str(tmp_path / "gap_src.xlsx")
    _write_xlsx(p2, [("S", [["title junk"],
                            ["A", "B", "A"],     # duplicate header label
                            ["1", "2", "3"]], False)])
    with zipfile.ZipFile(p2) as z:
        members = {m: z.read(m) for m in z.namelist()}
    # renumber rows 2,3 -> 3,4, leaving a TRUE gap at row 2 (no <row>)
    sheet = members["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace('<row r="3">', '<row r="4">')
    sheet = sheet.replace('<row r="2">', '<row r="3">')
    members["xl/worksheets/sheet1.xml"] = sheet.encode()
    p3 = str(tmp_path / "gap.xlsx")
    with zipfile.ZipFile(p3, "w") as z:
        for m, data in members.items():
            z.writestr(m, data)
    grid = ingest._xlsx_grid(p3, 0)
    assert grid[1] == [None, None, None]          # the blank row exists
    assert grid[2][0] == "A"                      # header at its shown row
    # range starting at the shown header row; dup labels must not raise
    out = ingest.read_xlsx(spark, [p3], columns=["A", "B"],
                           sheet=0, cell_range="A3:C4")
    rows_out = out.collect()
    assert len(rows_out) == 1
    assert rows_out[0]["A"] == "1" and rows_out[0]["B"] == "2"


def test_xlsx_unreferenced_cell_position():
    """Per ECMA-376 an unreferenced <c> occupies the column AFTER the
    previous cell, not the count of populated cells."""
    import zipfile
    from sequencing_integration_pipeline1_0_spark.sources import ingest
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = ("http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships")
    relns = "http://schemas.openxmlformats.org/package/2006/relationships"
    import tempfile, os
    p = os.path.join(tempfile.mkdtemp(), "sparse.xlsx")
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
             '<row r="1"><c r="C1"><v>1</v></c><c><v>2</v></c></row>'
             "</sheetData></worksheet>")
    wb = (f'<?xml version="1.0"?><workbook xmlns="{ns}" xmlns:r="{rns}">'
          f'<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
          f"</workbook>")
    rels = (f'<?xml version="1.0"?><Relationships xmlns="{relns}">'
            f'<Relationship Id="rId1" Type="{rns}/worksheet" '
            f'Target="worksheets/sheet1.xml"/></Relationships>')
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    (rnum, cells), = ingest._xlsx_sheet_rows(p, 0)
    assert cells == {2: "1", 3: "2"}   # C1 then the cell after it (D1)


def test_jsonl_roundtrip_allstring_with_corrupt_line(spark, tmp_path):
    """S6 widening: JSONL in/out under the all-string contract —
    numbers arrive as strings (schema drift can't flip a column type),
    NA vocabulary normalizes, malformed lines land in _corrupt_record
    instead of failing the scan, provenance rides along."""
    p = tmp_path / "shard.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "score": 0.5}\n'
        '{"doc_id": 2, "text": "N/A", "score": 3}\n'
        "this line is not json at all\n")
    df = ingest.read_any(spark, str(p))
    data_cols = [c for c in df.columns if c not in ("index",
                                                    "_corrupt_record")]
    assert all(dict(df.dtypes)[c] == "string" for c in data_cols)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows["1"]["score"] == "0.5"            # number -> string
    assert rows["2"]["text"] is None              # NA vocab -> NULL
    assert rows["1"]["index"].endswith("shard.jsonl")
    corrupt = [r for r in df.collect()
               if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1                      # bad line captured
    # sink roundtrip (write shards, read back)
    out = str(tmp_path / "out")
    clean = df.filter(F.col("_corrupt_record").isNull()) \
              .select("doc_id", "text", "score")
    sinks.write_jsonl(clean, out)
    back = ingest.read_jsonl_allstring(spark, out + "/*.json*",
                                       provenance=None)
    assert back.count() == 2


def test_mangle_dupes_avoids_preexisting_mangled_names():
    """A sheet mixing a duplicate with a pre-existing mangled label
    (A, A, A.1) must not re-create the duplicate the mangler exists to
    prevent (advice r4): the candidate loops past names already taken
    by emitted OR upcoming original headers."""
    m = ingest._mangle_dupes
    assert m(["A", "A", "A.1"]) == ["A", "A.2", "A.1"]
    assert m(["A", "A.1", "A"]) == ["A", "A.1", "A.2"]
    assert m(["A", "A", "A"]) == ["A", "A.1", "A.2"]
    out = m(["A", "A", "A.1", "A.1", "A.2"])
    assert len(set(out)) == len(out)
    assert m(["x", "y"]) == ["x", "y"]


def test_read_any_xlsx_contract_parity(spark, tmp_path):
    """read_any's xlsx quick path carries the SAME all-string ingest
    contract as the csv/jsonl branches (advice r4): NA vocabulary ->
    NULL, provenance column, and an empty sheet fails with a clear
    error instead of an opaque zero-column schema crash."""
    p = str(tmp_path / "q.xlsx")
    _write_xlsx(p, [("S", [["id", "val"], ["1", "N/A"], ["2", "ok"]],
                     True)])
    df = ingest.read_any(spark, p)
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["val"] is None                 # NA vocab applied
    assert rows["2"]["val"] == "ok"
    assert rows["1"]["index"].endswith("q.xlsx")    # provenance rides
    empty = str(tmp_path / "empty.xlsx")
    _write_xlsx(empty, [("S", [], True)])
    with pytest.raises(ValueError, match="no header row"):
        ingest.read_any(spark, empty)


def test_orc_round_trip_via_read_any(spark, tmp_path):
    from sequencing_integration_pipeline1_0_spark.sources.ingest import (
        read_any,
    )
    src = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, -1.0)], "id long, s string, x double")
    path = str(tmp_path / "t.orc")
    src.coalesce(1).write.orc(path)
    back = read_any(spark, path)
    assert back.schema == src.schema
    assert sorted(back.collect()) == sorted(src.collect())
