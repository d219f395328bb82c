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


#: warning-column order is load-bearing for the reference's `unite`
#: (wdrs_qa_main.R:256-258 pastes ends_with('_warn') in column order).
SEQ_QA_WARN_COLS = [
    "reason_null_warn", "reason_warn", "var_status_warn",
    "sa_null_status_complete_warn", "sa_null_variant_exists_warn",
    "variant_check_warn", "lab_name_warn", "date_warn", "seq_lab_neg_warn",
    "sca_sa_null_warn", "unexpected_char_warn", "notes_warn",
    "missing_lineage_warn", "sa_sca_var_dup_warn", "sa_sca_dup_warn",
    "sa_dup_warn",
]

#: notes lineage extraction — capture-group form of the reference's
#: lookbehind/lookahead pair (wdrs_qa_functions.R:178-180), portable to
#: engines without lookbehind (DuckDB RE2).
_NOTES_LINEAGE_RE = r"identified as (.*) on [0-9]{4}-[0-9]{2}-[0-9]{2}"


def _spaces(c: Column) -> Column:
    """str_count(x, ' ') with identical NULL semantics across engines."""
    return F.length(c) - F.length(F.replace(c, F.lit(" ")))


def seq_qa_checks(df: DataFrame, *,
                  specimen: str, reason: str, lab: str, lineage: str,
                  status: str, accession: str, clinical_accession: str,
                  collection_date: str, case_id: str, notes: str,
                  epi_isl: str, sequence_date: str,
                  accepted_lineages: Sequence[str],
                  lab_names: Sequence[str],
                  reasons: Sequence[str],
                  as_of: Column) -> DataFrame:
    """The reference's per-run destination-table QA battery as ONE pass:
    13 expression warnings + 3 cascading duplicate tiers, each a nullable
    string column ending in `_warn` that is NULL when clean and
    'Warning: ...' when flagged (seq_qa_checks,
    scripts/QA/wdrs_qa/wdrs_qa_functions.R:44-228).

    R semantics preserved under Spark's 3-valued logic:
      - `x %in% set` is FALSE for NA x, so `!x %in% set` is TRUE —
        modelled as ~coalesce(isin, FALSE) (reason/lab/variant checks);
      - `toupper(NA) %in% c(..., NA)` is TRUE, so the status whitelist
        treats NULL status as whitelisted (sa_null_status_complete);
      - everything else propagates NULL exactly like R's if_else(NA).

    `as_of` replaces R's today() so runs are deterministic/testable.

    Scale shape: the 13 expression warns are pure codegen (zero
    shuffle); the 3 dup tiers are window counts over
    (lineage,SA,SCA) ⊇ (SA,SCA) ⊇ (SA) — Catalyst plans them as one
    exchange on SA followed by in-partition sorts, since each key set
    is a prefix-extension of the coarsest. Nothing collects.
    """
    spec, rsn, lb = F.col(specimen), F.col(reason), F.col(lab)
    lin, stat, sa = F.col(lineage), F.col(status), F.col(accession)
    sca, cdate = F.col(clinical_accession), F.col(collection_date)
    cid, nts, isl = F.col(case_id), F.col(notes), F.col(epi_isl)
    sdate = F.col(sequence_date)
    in_set = lambda c, vals: F.coalesce(c.isin(list(vals)), F.lit(False))

    warn = {
        # wdrs_qa_functions.R:66-73
        "reason_null_warn": (spec == "Yes") & rsn.isNull() & lb.isNotNull(),
        # :76-80 (NA reason -> flagged, R %in% quirk)
        "reason_warn": (spec == "Yes") & ~in_set(rsn, reasons),
        # :83-89
        "var_status_warn": (lin.isNotNull() & (lin != "Unassigned")
                            & ~F.upper(stat).contains("COMPLETE")),
        # :93-98 (NULL status is whitelisted — NA %in% c(...,NA) is TRUE)
        "sa_null_status_complete_warn": (
            sa.isNull() & ~(F.upper(stat).isin(
                "FAILED", "LOW QUALITY", "FAILED, LOW QUALITY")
                | stat.isNull())),
        # :102-109 (the `!accession %in% repo` term is vacuously TRUE
        # because accession is NULL on this branch — R quirk preserved)
        "sa_null_variant_exists_warn": (
            sa.isNull() & (spec == "Yes") & lin.isNotNull()),
        # :112-117
        "variant_check_warn": (~in_set(lin, accepted_lineages)
                               & (lin != "Unassigned")),
        # :120-124
        "lab_name_warn": (spec == "Yes") & ~in_set(lb, lab_names),
        # :127-132
        "date_warn": (cdate < F.lit("2020-01-05").cast("date"))
        | (cdate > as_of),
        # :135-140
        "seq_lab_neg_warn": (spec == "No") & (sa.isNotNull()
                                              | lin.isNotNull()),
        # :143-152
        "sca_sa_null_warn": (
            sa.isNull() & sca.isNull() & (spec == "Yes")
            & (~F.upper(stat).rlike("FAILED|LOW QUALITY") | stat.isNull())),
        # :155-168 — str_count/str_detect OR-chain, NULLs propagate
        "unexpected_char_warn": (
            ((_spaces(sca) > 0)
             & ~sca.rlike("TSC|SPC|FH|MOLE|ACOV|KCMEO|PCME"))
            | sca.contains(".")
            | (_spaces(sa) > 0) | (_spaces(spec) > 0) | (_spaces(cid) > 0)
            | (_spaces(rsn) > 3) | (_spaces(sdate) > 0)
            | (_spaces(stat) > 1) | (_spaces(lin) > 0)
            | ~isl.contains("EPI_")),
        # :171-176
        "notes_warn": (
            nts.contains("identified as ")
            & (F.nullif(F.regexp_extract(nts, _NOTES_LINEAGE_RE, 1),
                        F.lit("")) != "None")
            & lin.isNull()),
        # :187-193
        "missing_lineage_warn": lin.isNull() & (stat == "Complete"),
    }
    msgs = {
        "reason_null_warn": "Warning: SEQUENCE_REASON is NULL",
        "reason_warn": "Warning: SEQUENCE_REASON not standardized",
        "var_status_warn": ("Warning: SEQUENCE_VARIANT_OPEN_TEXT filled "
                            "but SEQUENCE_STATUS is not COMPLETE"),
        "sa_null_status_complete_warn": (
            "Warning: SEQUENCE_ACCESSION number NULL but status not "
            "FAILED/LOW QUALITY"),
        "sa_null_variant_exists_warn": (
            "Warning: SEQUENCE_VARIANT_OPEN_TEXT exists but "
            "SEQUENCE_ACCESION number is null"),
        "variant_check_warn": ("Warning: SEQUENCE_VARIANT not of concern/"
                               "interest - check or update list"),
        "lab_name_warn": ("Warning: SEQUENCE_LAB not standardized - check "
                          "or update list"),
        "date_warn": ("Warning: SEQUENCE_SPECIMEN_COLLECTION_DATE out of "
                      "range. Before 1/05/2020 or after today's date"),
        "seq_lab_neg_warn": ("Warning: SEQUENCE_SPECIMEN = 'No' but "
                             "sequencing data attatched"),
        "sca_sa_null_warn": ("Warning: SEQUENCE_ACCESSION number and "
                             "SEQUENCE_CLINICAL_ACCESSION numbers missing"),
        "unexpected_char_warn": "Warning: Unexpected characters in a column",
        "notes_warn": ("Warning: Lineage found in SEQUENCE_NOTES but "
                       "SEQUENCE_VARIANT_OPEN_TEXT is NULL"),
        "missing_lineage_warn": (
            "Warning: SEQUENCE_STATUS = 'Complete' and "
            "SEQUENCE_VARIANT_OPEN_TEXT is NULL"),
    }
    out = df.withColumns(
        {k: F.when(cond, F.lit(msgs[k])) for k, cond in warn.items()})

    # cascading duplicate tiers (wdrs_qa_functions.R:197-228). All three
    # window keys start with SA, and the COARSEST window is attached
    # first so it plans bottom-most: its exchange on hash(SA) already
    # satisfies the finer keys' clustered distribution (subset rule) —
    # the plan gets ONE exchange + three in-partition sorts, not three
    # shuffles (verified in tests/test_plans.py).
    out = out.withColumn(
        "__n_sa", F.count(F.lit(1)).over(Window.partitionBy(accession)))
    out = out.withColumn(
        "__n_sasca", F.count(F.lit(1)).over(
            Window.partitionBy(accession, clinical_accession)))
    out = out.withColumn(
        "__n_lsasca", F.count(F.lit(1)).over(
            Window.partitionBy(accession, clinical_accession, lineage)))
    tier1 = F.when(
        (F.col("__n_lsasca") > 1) & lin.isNotNull() & sa.isNotNull()
        & sca.isNotNull(),
        "Warning: Duplicate - SCA, SA and Variant duplicated")
    out = out.withColumn("sa_sca_var_dup_warn", tier1)
    out = out.withColumn(
        "sa_sca_dup_warn",
        F.when((F.col("__n_sasca") > 1) & sa.isNotNull() & sca.isNotNull()
               & F.col("sa_sca_var_dup_warn").isNull(),
               "Warning: Duplicate - SCA and SA duplicated"))
    out = out.withColumn(
        "sa_dup_warn",
        F.when((F.col("__n_sa") > 1) & sa.isNotNull()
               & F.col("sa_sca_dup_warn").isNull()
               & F.col("sa_sca_var_dup_warn").isNull(),
               "Warning: Duplicate - SA duplicated"))
    return out.drop("__n_sa", "__n_sasca", "__n_lsasca")


def unite_warnings(df: DataFrame, *, out: str = "flag",
                   warn_cols: Sequence[str] | None = None) -> DataFrame:
    """wdrs_qa_main.R:256-260: paste all `_warn` columns into one
    queryable `flag` column (na.rm — concat_ws skips NULLs in both
    Spark and ANSI SQL) and keep only flagged rows."""
    cols = list(warn_cols) if warn_cols is not None else [
        c for c in df.columns if c.endswith("_warn")]
    united = df.withColumn(out, F.concat_ws("_", *[F.col(c) for c in cols]))
    return united.filter(F.col(out).contains("Warning"))


def match_in_wdrs_keep_na(df: DataFrame, *, wdrs: DataFrame,
                          keep_na: DataFrame,
                          sca_col: str = "SEQUENCE_CLINICAL_ACCESSION",
                          sa_col: str = "SEQUENCE_ACCESSION") -> DataFrame:
    """pipeline_counts.qmd:60-78 match_in_wdrs_keep_na: attach
    `in_wdrs` / `in_keep_na` 1/0 flags — each is 1 when the row's SCA
    is in that destination's SCA set OR its SA is in the SA set
    (NA keys omitted from the sets, na.omit).

    The reference pulls both destination columns into R vectors; here
    each set distinct-reduces and BROADCASTS, so the probe side never
    shuffles and the sets may exceed one node's R heap. Four broadcast
    left joins -> two OR flags, all codegen."""
    out = df
    hits = {}
    for flag, src in (("in_wdrs", wdrs), ("in_keep_na", keep_na)):
        for i, col in enumerate((sca_col, sa_col)):
            vals = (src.select(F.col(col).alias(f"__{flag}_{i}"))
                       .where(F.col(col).isNotNull()).distinct())
            out = out.join(F.broadcast(vals),
                           out[col] == vals[f"__{flag}_{i}"], "left")
        hits[flag] = (F.when(F.col(f"__{flag}_0").isNotNull()
                             | F.col(f"__{flag}_1").isNotNull(), 1)
                       .otherwise(0))
    return out.withColumns(hits).drop(
        "__in_wdrs_0", "__in_wdrs_1", "__in_keep_na_0", "__in_keep_na_1")


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


#: Benford first-digit expected probabilities log10(1 + 1/d), d=1..9 —
#: computed once in Python so both engines consume the same literals
#: (the fuzzy.fs_weights precedent: no per-row transcendental).
def benford_probs() -> tuple[float, ...]:
    import math
    return tuple(math.log10(1 + 1 / d) for d in range(1, 10))


def benford_first_digit(df: DataFrame, col: str, *,
                        round_to: int = 6) -> DataFrame:
    """Benford's-law first-significant-digit screen over a positive
    numeric column — the classic data-quality / fabrication test
    (naturally-arising amounts follow P(d) = log10(1+1/d); synthetic
    or truncated feeds don't). Returns 9 rows:
      (digit, observed, expected, chi2_contrib)
    where expected = P(d) * n and chi2_contrib = (obs - exp)^2 / exp
    — the per-digit decomposition of the chi-square statistic, so the
    anomalous digit is visible, not just the aggregate.

    Determinism: the first significant digit comes from INTEGER
    arithmetic — the value is scaled to cents, cast to BIGINT, and
    the leading character of the integer's string rendering is taken
    (bigint-to-string is identical across engines; double-to-string
    is NOT, which is why the cast matters). The P(d) literals are
    Python-computed; expected/contribution are mirrored double ops.

    Scale shape: one map-side digit extraction, a 9-key agg with
    map-side combine, 9-row finishing arithmetic with the row count
    carried through the agg (no scalar rejoin). The positivity filter
    is on the SCALED integer (cents > 0), not the raw double: a value
    in (0, 0.005) rounds to 0 cents, whose first "digit" would be 0 —
    an invalid element_at index. Absent digits are materialized with
    observed = 0 via a 9-row literal spine so the chi-square total
    carries their full (0-exp)^2/exp contribution (a digit that never
    appears is exactly the anomaly this screen exists to flag). The
    fully-degenerate input (zero positive-cents rows → n = 0, every
    expected count 0) yields chi2_contrib = 0.0, the 0/0 limit, rather
    than an engine-dependent null from (0-0)^2/0."""
    cents = F.round(F.col(col) * 100).cast("long")
    observed = (df.select(cents.alias("cents"))
                  .filter(F.col("cents") > 0)
                  .select(F.substring(F.col("cents").cast("string"),
                                      1, 1).cast("int").alias("digit"))
                  .groupBy("digit")
                  .agg(F.count(F.lit(1)).alias("observed")))
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit"))
    obs = (spine.join(observed, "digit", "left")
                .select("digit",
                        F.coalesce("observed",
                                   F.lit(0).cast("long")).alias("observed")))
    # total carried via a window over the 9-row digit table — bounded
    # by construction, avoids a 1-row scalar rejoin
    from pyspark.sql import Window
    tot = F.sum("observed").over(
        Window.partitionBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing))
    p = F.element_at(F.array(*[F.lit(x) for x in benford_probs()]),
                     F.col("digit"))
    exp = p * F.col("n").cast("double")
    contrib = F.when(exp > 0,
                     (F.col("observed") - exp)
                     * (F.col("observed") - exp) / exp
                     ).otherwise(F.lit(0.0))
    return (obs.withColumn("n", tot)
               .select("digit", "observed",
                       F.round(exp, round_to).alias("expected"),
                       F.round(contrib, round_to).alias("chi2_contrib")))


#: ks_binned_drift default bin count; the oracle SQL (catalog._KS_SQL)
#: interpolates the SAME value the keyword default binds
KS_BINS = 32


def ks_binned_drift(df: DataFrame, value_col: str, grp_col: str, *,
                    bins: int = KS_BINS,
                    round_to: int = 6) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift screen over a
    numeric column split into two cohorts (grp 0 vs 1) — the
    rank-based complement to the PSI screen (PSI is sensitive to
    mass reallocation between bins; KS to a location/scale shift of
    the whole distribution). Values bin into `bins` equal-width
    buckets over the pooled [min, max]; each bucket row carries both
    cohorts' counts, empirical CDFs, and |CDF_a - CDF_b| — the KS
    statistic is the column max, and the bin where it peaks localizes
    the drift. Exact KS needs a global sort of every observation;
    binning bounds the error by the largest bucket's mass while
    keeping every step bounded — the only honest shape at 100 TB.

    Determinism: the bin index comes from one double division of
    pooled-extreme-derived operands, mirrored exactly by the oracle;
    CDFs are single divisions of exact integer cumulative counts.
    Degenerate cohorts (one side empty) yield CDF 0 via the
    greatest(total, 1) guard instead of engine-dependent nulls; a
    constant column (max == min) lands everything in bin 0.

    Scale shape: one 2-scalar extremes agg broadcast back map-side,
    one bins-key agg with map-side combine, then bounded spine
    windows (cumulative + totals) over `bins` rows."""
    mm = df.agg(F.min(F.col(value_col).cast("double")).alias("lo"),
                F.max(F.col(value_col).cast("double")).alias("hi"))
    v = (df.filter(F.col(value_col).isNotNull())
           .select(F.col(grp_col).cast("int").alias("grp"),
                   F.col(value_col).cast("double").alias("v"))
           .join(F.broadcast(mm)))
    bin_col = (F.when(F.col("hi") > F.col("lo"),
                      F.least(F.lit(bins - 1),
                              F.floor((F.col("v") - F.col("lo"))
                                      / (F.col("hi") - F.col("lo"))
                                      * bins)))
                .otherwise(F.lit(0))).cast("int")
    q = v.select("grp", bin_col.alias("bin"))
    spine = df.sparkSession.range(0, bins).select(
        F.col("id").cast("int").alias("bin"))
    cnt = (q.groupBy("bin")
            .agg(F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
                  .cast("long").alias("n_a"),
                 F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
                  .cast("long").alias("n_b")))
    j = (spine.join(cnt, "bin", "left")
              .select("bin",
                      F.coalesce("n_a", F.lit(0).cast("long"))
                       .alias("n_a"),
                      F.coalesce("n_b", F.lit(0).cast("long"))
                       .alias("n_b")))
    from pyspark.sql import Window
    w_cum = Window.partitionBy(F.lit(1)).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    cdf_a = F.round(F.sum("n_a").over(w_cum)
                    / F.greatest(F.sum("n_a").over(w_all), F.lit(1)),
                    round_to)
    cdf_b = F.round(F.sum("n_b").over(w_cum)
                    / F.greatest(F.sum("n_b").over(w_all), F.lit(1)),
                    round_to)
    return (j.select("bin", "n_a", "n_b",
                     cdf_a.alias("cdf_a"), cdf_b.alias("cdf_b"))
             .select("bin", "n_a", "n_b", "cdf_a", "cdf_b",
                     F.round(F.abs(F.col("cdf_a") - F.col("cdf_b")),
                             round_to).alias("ks_dist")))


def cvm_binned_drift(df: DataFrame, value_col: str, grp_col: str, *,
                     bins: int = KS_BINS,
                     round_to: int = 6) -> DataFrame:
    """Binned two-sample Cramér-von-Mises drift screen — the
    integral complement to the KS screen on the same binned shape:
    KS reads only the SINGLE largest CDF gap, so a distribution that
    diverges moderately across its whole range (heavier tails, wider
    spread) can slip under a KS threshold; CvM accumulates the
    SQUARED gap over every bin weighted by pooled mass,
      term_bin = ((n_a + n_b) / N) * (cdf_a - cdf_b)^2,
    i.e. the integral of (F_a - F_b)^2 under the pooled empirical
    measure — the T2 statistic's binned form. Returns the ks
    per-bin rows with cvm_term replacing ks_dist plus the constant
    cvm_stat column (the exact-decimal sum of the rounded terms), so
    both the aggregate and WHERE the divergence accumulates are
    visible.

    Determinism: cdf_a/cdf_b are the ks screen's rounded values; the
    term is one mirrored double expression of exact-integer-derived
    operands, rounded and summed in DECIMAL (partition-order
    independent).

    Scale shape: rides ks_binned_drift (one extremes agg, one
    bins-key agg, bounded spine windows); adds only bins-row
    finishing arithmetic."""
    from pyspark.sql import Window

    base = ks_binned_drift(df, value_col, grp_col, bins=bins,
                           round_to=round_to)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    nn = (F.col("n_a") + F.col("n_b")).cast("double")
    big_n = F.greatest(F.sum(F.col("n_a") + F.col("n_b")).over(w_all)
                        .cast("double"), F.lit(1.0))
    gap = F.col("cdf_a") - F.col("cdf_b")
    term = F.round(nn / big_n * gap * gap, round_to) \
            .cast(f"decimal(18,{round_to})")
    return (base.select("bin", "n_a", "n_b", "cdf_a", "cdf_b",
                        term.alias("t"))
                .select("bin", "n_a", "n_b", "cdf_a", "cdf_b",
                        F.col("t").cast("double").alias("cvm_term"),
                        F.round(F.sum("t").over(w_all).cast("double"),
                                round_to).alias("cvm_stat")))


#: sliding-PSI defaults; the oracle SQL interpolates the SAME values
PSI_SLIDING_BINS = 10
PSI_SLIDING_WINDOW = 7


def psi_sliding_drift(df: DataFrame, value_col: str, day_col: str, *,
                      bins: int = PSI_SLIDING_BINS,
                      window: int = PSI_SLIDING_WINDOW,
                      round_to: int = 6) -> DataFrame:
    """Per-day SLIDING-window PSI drift monitor — the continuous form
    of the two-snapshot PSI screen: for every day with a full
    `window`-day history, the PSI of the feature distribution in the
    trailing window against the GLOBAL baseline distribution,
      psi(d) = sum_bins (p_win - p_base) * ln(p_win / p_base),
    Laplace-smoothed p = (n + 1) / (total + bins) so empty bins stay
    finite (the qa_psi_drift smoothing, shared exactly by the
    oracle). This is the shape a production feed monitor runs: one
    row per day, alertable at the usual PSI thresholds (0.1 / 0.25),
    catching gradual drift that any single snapshot pair misses.
    Returns (day, n_win, psi) ordered by the day spine.

    The calendar DENSIFIES over the global [min, max] day x the full
    bin spine (absent (day, bin) cells zero-filled) so an outage day
    scores against the baseline instead of vanishing from a ROWS
    window (the evt_anomaly_zscore discipline); days without a full
    history are fenced off.

    Determinism: bin indices from one mirrored double division of
    pooled-extreme operands (the ks screen's rule); window sums are
    exact integers; contributions round to 1e-round_to and sum in
    DECIMAL per day.

    Scale shape: one 2-scalar extremes agg broadcast map-side, one
    (day, bin)-key agg with map-side combine — the fact table never
    shuffles again; everything after runs on the days x bins grid
    (bounded by the calendar, not the row count): per-bin ordered
    windows for the trailing sums, one grid-sized groupBy(day)."""
    from pyspark.sql import Window

    mm = df.agg(F.min(F.col(value_col).cast("double")).alias("lo"),
                F.max(F.col(value_col).cast("double")).alias("hi"))
    v = (df.filter(F.col(value_col).isNotNull())
           .select(F.col(day_col).alias("day"),
                   F.col(value_col).cast("double").alias("v"))
           .join(F.broadcast(mm)))
    bin_col = (F.when(F.col("hi") > F.col("lo"),
                      F.least(F.lit(bins - 1),
                              F.floor((F.col("v") - F.col("lo"))
                                      / (F.col("hi") - F.col("lo"))
                                      * bins)))
                .otherwise(F.lit(0))).cast("int")
    cnt = (v.select("day", bin_col.alias("bin"))
            .groupBy("day", "bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    days = (cnt.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
               .select(F.explode(F.sequence("d0", "d1")).alias("day")))
    spine = (days.join(df.sparkSession.range(0, bins).select(
                 F.col("id").cast("int").alias("bin"))))
    grid = (spine.join(cnt, ["day", "bin"], "left")
                 .select("day", "bin",
                         F.coalesce("n", F.lit(0).cast("long"))
                          .alias("n")))
    w_trail = (Window.partitionBy("bin").orderBy("day")
               .rowsBetween(-window, -1))
    w_bin = Window.partitionBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_day = Window.partitionBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    rn = F.row_number().over(Window.partitionBy("bin").orderBy("day"))
    g = (grid.withColumn("n_w", F.sum("n").over(w_trail))
             .withColumn("rn", rn)
             .withColumn("n_base", F.sum("n").over(w_bin))
             .filter(F.col("rn") > window)
             .withColumn("t_w", F.sum("n_w").over(w_day))
             .withColumn("t_base",
                         F.sum("n_base").over(w_day)))
    p_w = (F.col("n_w") + 1.0) / (F.col("t_w") + float(bins))
    p_b = (F.col("n_base") + 1.0) / (F.col("t_base") + float(bins))
    contrib = (F.round((p_w - p_b) * F.log(p_w / p_b), round_to)
                .cast(f"decimal(18,{round_to})"))
    return (g.select("day", F.col("n_w").alias("nw"),
                     contrib.alias("c"))
             .groupBy("day")
             .agg(F.sum("nw").cast("long").alias("n_win"),
                  F.round(F.sum("c").cast("double"), round_to)
                   .alias("psi"))
             .select(F.col("day").cast("string").alias("day"),
                     "n_win", "psi"))


def chi2_independence(df: DataFrame, a_col: str, b_col: str, *,
                      missing: str = "(missing)",
                      round_to: int = 6) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns — the QA battery's cross-feature screen (are quality
    labels independent of source? language of crawl batch?): the full
    contingency table with expected counts under independence and the
    per-cell chi-square contribution, so the DEVIANT cell is visible,
    not just the aggregate statistic. NULL categories become a real
    `missing` level (the a8 missing-as-level discipline) and absent
    combinations materialize with observed = 0 via the level-spine
    cross join — a combination that never occurs is exactly what the
    screen exists to flag.

    Determinism: expected = (row_total * col_total) / n with the
    totals exact integers (cast double before the multiply so giant
    corpora can't overflow the product), one mirrored division;
    contributions guard expected > 0 (the Benford 0/0 rule).

    Scale shape: one map-side coalesce + a (a, b)-key agg with
    map-side combine; everything after runs on the contingency table,
    whose size is |levels(a)| x |levels(b)| — bounded by the category
    vocabularies, not the row count."""
    from pyspark.sql import Window
    a = F.coalesce(F.col(a_col).cast("string"), F.lit(missing))
    b = F.coalesce(F.col(b_col).cast("string"), F.lit(missing))
    d2 = df.select(a.alias("a"), b.alias("b"))
    obs = d2.groupBy("a", "b").agg(F.count(F.lit(1)).alias("observed"))
    spine = (d2.select("a").distinct()
               .join(F.broadcast(d2.select("b").distinct())))
    j = (spine.join(obs, ["a", "b"], "left")
              .select("a", "b",
                      F.coalesce("observed", F.lit(0).cast("long"))
                       .alias("observed")))
    w_row = Window.partitionBy("a").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_col = Window.partitionBy("b").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    rt = F.sum("observed").over(w_row)
    ct = F.sum("observed").over(w_col)
    n = F.sum("observed").over(w_all)
    exp = rt.cast("double") * ct.cast("double") / n
    o = F.col("observed").cast("double")
    contrib = F.when(exp > 0, (o - exp) * (o - exp) / exp) \
               .otherwise(F.lit(0.0))
    return (j.select("a", "b", "observed",
                     F.round(exp, round_to).alias("expected"),
                     F.round(contrib, round_to).alias("chi2_contrib")))
