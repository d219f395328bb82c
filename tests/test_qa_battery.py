"""seq_qa_checks R-semantics edge rows: hand-built frames pinning the
NA-propagation quirks the battery must preserve (wdrs_qa_functions.R:
44-228). The oracle corpus covers the bulk combinatorics; these rows
document the deliberate weirdness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sequencing_integration_pipeline1_0_spark.operators import qa

COLS = ("case_id string, specimen string, reason string, lab string, "
        "lineage string, status string, sa string, sca string, "
        "collection_date date, notes string, epi_isl string, "
        "sequence_date string")

DEFAULTS = dict(case_id="1", specimen="Yes", reason="OTHER", lab="PHL",
                lineage="B.1.1.7", status="Complete",
                sa="USA/WA-CDC-1/2021", sca="WA1",
                collection_date="2021-06-01",
                notes=None, epi_isl="EPI_ISL_1", sequence_date=None)


def _run(spark, rows):
    import datetime as dt
    data = []
    for over in rows:
        r = {**DEFAULTS, **over}
        if isinstance(r["collection_date"], str):
            r["collection_date"] = dt.date.fromisoformat(r["collection_date"])
        data.append(tuple(r[k] for k in (
            "case_id", "specimen", "reason", "lab", "lineage", "status",
            "sa", "sca", "collection_date", "notes", "epi_isl",
            "sequence_date")))
    df = spark.createDataFrame(data, COLS)
    out = qa.seq_qa_checks(
        df, specimen="specimen", reason="reason", lab="lab",
        lineage="lineage", status="status", accession="sa",
        clinical_accession="sca", collection_date="collection_date",
        case_id="case_id", notes="notes", epi_isl="epi_isl",
        sequence_date="sequence_date",
        accepted_lineages=["B.1.1.7"], lab_names=["PHL"],
        reasons=["OTHER"], as_of=F.lit("2024-03-01").cast("date"))
    return out.collect()


def test_null_reason_triggers_both_reason_warns(spark):
    """R: NA %in% list is FALSE, so a NULL reason fires reason_warn AND
    (with a lab present) reason_null_warn."""
    (r,) = _run(spark, [dict(reason=None)])
    assert r["reason_null_warn"] is not None
    assert r["reason_warn"] is not None


def test_null_status_is_whitelisted_for_sa_null_check(spark):
    """R: toupper(NA) %in% c(...able, NA) is TRUE — NULL status counts
    as FAILED/LOW-QUALITY-adjacent and must NOT fire
    sa_null_status_complete_warn."""
    (r,) = _run(spark, [dict(sa=None, sca="WA9", status=None,
                             lineage=None)])
    assert r["sa_null_status_complete_warn"] is None
    # but the sca_sa_null check treats NULL status as missing -> fires
    # only when sca is ALSO null; here sca present -> no warn
    assert r["sca_sa_null_warn"] is None


def test_null_lineage_gives_null_variant_check(spark):
    """R: !(NA %in% variants) is TRUE but NA != 'Unassigned' is NA, so
    the whole condition is NA -> no warn (NULL, not fired)."""
    (r,) = _run(spark, [dict(lineage=None, status="Failed")])
    assert r["variant_check_warn"] is None


def test_null_lab_with_specimen_yes_fires_lab_name_warn(spark):
    (r,) = _run(spark, [dict(lab=None, reason="OTHER")])
    assert r["lab_name_warn"] is not None
    # and reason_null needs a NON-null lab, so it must NOT fire
    (r2,) = _run(spark, [dict(lab=None, reason=None)])
    assert r2["reason_null_warn"] is None


def test_unexpected_char_null_propagation(spark):
    """A NULL column contributes NULL to the OR chain: no TRUE term ->
    no warn; one TRUE term anywhere -> warn despite other NULLs."""
    (clean,) = _run(spark, [dict(sca=None, sequence_date=None,
                                 epi_isl=None)])
    assert clean["unexpected_char_warn"] is None
    (dirty,) = _run(spark, [dict(sca=None, sequence_date="2021 01 01",
                                 epi_isl=None)])
    assert dirty["unexpected_char_warn"] is not None


def test_sca_whitelist_prefixes_not_flagged(spark):
    (ok,) = _run(spark, [dict(sca="TSC 12-34")])
    assert ok["unexpected_char_warn"] is None
    (bad,) = _run(spark, [dict(sca="AB 12-34")])
    assert bad["unexpected_char_warn"] is not None


def test_notes_none_lineage_not_flagged(spark):
    """'identified as None' must not fire notes_warn; a real lineage in
    notes with NULL lineage column must."""
    (none_row,) = _run(spark, [dict(
        lineage=None, status="Failed",
        notes="Lineage identified as None on 2024-01-15.")])
    assert none_row["notes_warn"] is None
    (real_row,) = _run(spark, [dict(
        lineage=None, status="Failed",
        notes="Lineage identified as BA.2 on 2024-01-15.")])
    assert real_row["notes_warn"] is not None


def test_dup_tiers_cascade_not_stack(spark):
    """Identical (lineage, SA, SCA) pairs fire ONLY tier 1; same
    (SA, SCA) with different lineage fires ONLY tier 2; same SA with
    different SCA fires ONLY tier 3."""
    rows = _run(spark, [
        dict(case_id="a1", sa="SA-X", sca="C1", lineage="B.1.1.7"),
        dict(case_id="a2", sa="SA-X", sca="C1", lineage="B.1.1.7"),
        dict(case_id="b1", sa="SA-Y", sca="C2", lineage="B.1.1.7"),
        dict(case_id="b2", sa="SA-Y", sca="C2", lineage=None,
             status="Failed"),
        dict(case_id="c1", sa="SA-Z", sca="C3", lineage="B.1.1.7"),
        dict(case_id="c2", sa="SA-Z", sca="C4", lineage="B.1.1.7"),
    ])
    by = {r["case_id"]: r for r in rows}
    for cid in ("a1", "a2"):
        assert by[cid]["sa_sca_var_dup_warn"] is not None
        assert by[cid]["sa_sca_dup_warn"] is None
        assert by[cid]["sa_dup_warn"] is None
    # b1 has non-null lineage but its twin differs -> tier1 group size 1
    for cid in ("b1", "b2"):
        assert by[cid]["sa_sca_var_dup_warn"] is None
        assert by[cid]["sa_sca_dup_warn"] is not None
        assert by[cid]["sa_dup_warn"] is None
    for cid in ("c1", "c2"):
        assert by[cid]["sa_sca_var_dup_warn"] is None
        assert by[cid]["sa_sca_dup_warn"] is None
        assert by[cid]["sa_dup_warn"] is not None
