"""QA-filter engine — the reference's signature composite operator
(SURVEY §2.8; scripts/Roster_scripts/quality_filters.R:55-202).

Design: a *library of named flag Column builders* applied in one
`withColumns` pass, plus window-based in-batch dup flags and
semi-join-based destination-dup flags, plus the row `qa_sum` and the
printed colSums summary (quality_filters.R:188-199).

Reused by every path in the reference (template :892, phl :802,
elr :595, keep_na :606, compile :299/:361) — here one parameterized
function.

Scale notes: expression flags are free (codegen); dup flags are one
window shuffle per distinct key set; membership flags broadcast the
value set when small (reference pulls the whole WDRS column to a
vector — we instead left_semi/broadcast join, which survives a value
set that doesn't fit on one node).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_flag_exprs(df: DataFrame, flags: Mapping[str, Column]) -> DataFrame:
    """Attach nullable 0/1 flag columns from pure expressions."""
    return df.withColumns({name: F.when(cond, F.lit(1)) for name, cond in flags.items()})


def apply_dup_flags(df: DataFrame,
                    dup_specs: Mapping[str, Sequence[str]],
                    exempt: Mapping[str, Column] | None = None) -> DataFrame:
    """In-batch duplicate flags: name -> key columns
    (QA_SCA_INT_DUPE / QA_SA_INT_DUPE, quality_filters.R:65-76).
    Null/empty keys never flag.

    `exempt` maps a flag name to a row predicate that suppresses it —
    the reference's file-name-keyed exemption (submissions whose source
    file contains 'duplicates_roster' are ALLOWED to duplicate SCAs,
    quality_filters.R:120-138). Exempt rows neither flag themselves nor
    stop counting toward other rows' duplicate counts — matching the
    reference, which nulls the flag after computing it."""
    exempt = exempt or {}
    str_cols = {f.name for f in df.schema.fields
                if f.dataType.simpleString() == "string"}
    cols = {}
    for name, keys in dup_specs.items():
        w = Window.partitionBy(*keys)
        nonnull = F.lit(True)
        for k in keys:
            nonnull = nonnull & F.col(k).isNotNull()
            if k in str_cols:  # empty string is "missing", never a dupe
                nonnull = nonnull & (F.trim(F.col(k)) != "")
        flag = F.when(nonnull & (F.count(F.lit(1)).over(w) > 1), F.lit(1))
        if name in exempt:
            flag = F.when(exempt[name], F.lit(None)).otherwise(flag)
        cols[name] = flag
    return df.withColumns(cols)


def apply_membership_flags(df: DataFrame,
                           specs: Mapping[str, tuple[str, DataFrame, str]]) -> DataFrame:
    """Destination-duplicate flags: name -> (col, other_df, other_col).
    Flag = 1 when value already exists in the destination set
    (QA_SCA_WDRS_DUPE / QA_SA_WDRS_DUPE, quality_filters.R:69-76).

    Implemented as a broadcast left join against the distinct value set
    (scales past the reference's pull-the-column-to-a-vector)."""
    out = df
    for name, (col, other, ocol) in specs.items():
        vals = other.select(F.col(ocol).alias(f"__hit_{name}")).filter(
            F.col(ocol).isNotNull()).distinct()
        out = (out.join(F.broadcast(vals),
                        out[col] == vals[f"__hit_{name}"], "left")
                  .withColumn(name, F.when(F.col(f"__hit_{name}").isNotNull(), F.lit(1)))
                  .drop(f"__hit_{name}"))
    return out


def add_flag_sum(df: DataFrame, flag_cols: Sequence[str] | None = None,
                 out: str = "qa_sum", prefix: str = "QA_") -> DataFrame:
    """Row-wise flag sum (quality_filters.R:188-192) — a plain expression
    sum of coalesce(flag, 0); no row UDF."""
    cols = list(flag_cols) if flag_cols is not None else [
        c for c in df.columns if c.startswith(prefix)]
    total = None
    for c in cols:
        term = F.coalesce(F.col(c), F.lit(0))
        total = term if total is None else total + term
    return df.withColumn(out, total if total is not None else F.lit(0))


def qa_summary(df: DataFrame, flag_cols: Sequence[str] | None = None,
               prefix: str = "QA_") -> DataFrame:
    """colSums observability table (quality_filters.R:195-199)."""
    cols = list(flag_cols) if flag_cols is not None else [
        c for c in df.columns if c.startswith(prefix)]
    return df.agg(*[F.sum(F.coalesce(F.col(c), F.lit(0))).alias(c) for c in cols],
                  F.count(F.lit(1)).alias("n_rows"))


def sentinel_row_scan(df: DataFrame, sentinel: str = "QA CHECK FAIL",
                      cols: Sequence[str] | None = None,
                      out: str = "has_sentinel") -> DataFrame:
    """P7: scan every (string) column of the row for a sentinel value
    (elr.Rmd:560-579) — F.exists over an array of the columns."""
    target = list(cols) if cols is not None else [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    arr = F.array(*[F.col(c) for c in target])
    return df.withColumn(
        out, F.exists(arr, lambda x: x.isNotNull() & x.contains(sentinel)))


def roster_filters(df: DataFrame, *,
                   expr_flags: Mapping[str, Column] | None = None,
                   dup_specs: Mapping[str, Sequence[str]] | None = None,
                   dup_exempt: Mapping[str, Column] | None = None,
                   membership_specs: Mapping[str, tuple[str, DataFrame, str]] | None = None,
                   sum_col: str = "qa_sum") -> DataFrame:
    """The composed engine: expression flags + in-batch dup flags +
    destination dup flags + row sum, mirroring
    roster_filters(df, lab_vars, wdrs_sa, wdrs_sca, lineages, roster=)
    at quality_filters.R:55-202. Mode switches (roster=TRUE nulling
    certain flags) are expressed by the caller simply not passing those
    flag builders."""
    out = df
    if expr_flags:
        out = apply_flag_exprs(out, expr_flags)
    if dup_specs:
        out = apply_dup_flags(out, dup_specs, dup_exempt)
    if membership_specs:
        out = apply_membership_flags(out, membership_specs)
    flag_cols = ([*(expr_flags or {}).keys(), *(dup_specs or {}).keys(),
                  *(membership_specs or {}).keys()])
    return add_flag_sum(out, flag_cols, out=sum_col)


def prematch_filters(df: DataFrame, *,
                     first: str = "FIRST_NAME", last: str = "LAST_NAME",
                     dob: str = "DOB",
                     cdate: str = "SPECIMEN_COLLECTION_DATE") -> DataFrame:
    """§2.8 pre-match variant (fuzzy.Rmd:404-452): rows unfit for the
    fuzzy join get flagged before blocking — names null or containing
    digits (QA_NAME_NA), DOB null / unparseable / the 1899-12-30
    Excel-zero artifact (QA_DOB_NA), collection date missing or
    unparseable (QA_COLLECT_DATE_NA) — plus the qa_sum the router keys
    on."""
    from ..functions import dates
    dob_d = dates.parse_date_multi(dob)
    cd_d = dates.parse_date_multi(cdate)
    has_digit = "[0-9]"
    flagged = apply_flag_exprs(df, {
        "QA_NAME_NA": (F.col(first).isNull() | F.col(last).isNull()
                       | F.col(first).rlike(has_digit)
                       | F.col(last).rlike(has_digit)),
        "QA_DOB_NA": (F.col(dob).isNull() | dob_d.isNull()
                      | (dob_d == F.lit("1899-12-30").cast("date"))),
        "QA_COLLECT_DATE_NA": F.col(cdate).isNull() | cd_d.isNull(),
    })
    return add_flag_sum(flagged,
                        ["QA_NAME_NA", "QA_DOB_NA", "QA_COLLECT_DATE_NA"])
