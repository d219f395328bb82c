"""Accession/GISAID-ID synthesis, decomposition & validation
(SURVEY §2.7 F4/F5/F6/F15/F16).

Reference semantics (see /root/reference):
  - per-submitter GISAID-ID synthesis with lookaround extraction
    (docs/notebooks/elr.Rmd:190-255, template_submitters.Rmd:631-652)
  - ID decomposition into components (scripts/QA/wdrs_qa/wdrs_qa_functions.R:289-332)
  - validation regexes (quality_filters.R:18,30-32;
    template_submitters.Rmd:427-494)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- validation predicates (F15) ---------------------------------------
#: quality_filters.R:18 — general sequence-accession contract.
RE_SEQUENCE_ACCESSION = r"^(hCoV-19/)?USA/WA-.*/[0-9]{4}$"
#: per-lab variants (template_submitters.Rmd:427-494)
RE_AEGIS = r"^ASC\d*-B.*"
RE_LABCORP = r"^LC\d*$"
RE_HELIX = r"^USA/WA-CDC-STM-.*"
#: quality_filters.R:30-32 — lineage shapes.
RE_LINEAGE_LOOSE = r"[A-Za-z]{1,2}\.[0-9]{1,2}"
RE_LINEAGE_STRICT = r"^[A-Z]+(\.\d+)*$"
#: valid-year suffix check (quality_filters.R:153-163)
RE_VALID_YEAR_SUFFIX = r"(2020|2021|2022|2023|2024|2025)$"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_sequence_accession(col: Column | str) -> Column:
    return _c(col).rlike(RE_SEQUENCE_ACCESSION)


def is_lineage(col: Column | str, strict: bool = True) -> Column:
    return _c(col).rlike(RE_LINEAGE_STRICT if strict else RE_LINEAGE_LOOSE)


def is_all_digits(col: Column | str) -> Column:
    """CASE_ID all-numeric check (quality_filters.R:153)."""
    return _c(col).rlike(r"^[0-9]+$")


def space_count(col: Column | str) -> Column:
    """F16: number of spaces (wdrs_qa_functions.R:154-167)."""
    return F.length(_c(col)) - F.length(F.regexp_replace(_c(col), " ", ""))


def synthesize_gisaid_id(extract: Column | str, date_col: Column | str,
                         prefix: str = "USA/WA-CDC-") -> Column:
    """F4: paste0(prefix, extract, "/", year(date)) (elr.Rmd:190-255)."""
    return F.concat(F.lit(prefix), _c(extract), F.lit("/"),
                    F.year(_c(date_col)).cast("string"))


def middle_token(col: Column | str) -> Column:
    """Lookaround extraction "(?<=-).*(?=-)" — text between the first
    and last hyphen (elr.Rmd:213)."""
    return F.regexp_extract(_c(col), r"-(.*)-", 1)


def split_gisaid_id(col: Column | str) -> dict[str, Column]:
    """F5: decomposition bundle (wdrs_qa_functions.R:289-332).

    Returns named Column expressions for df.withColumns — the UDTF-like
    table-in/table-out generator as plain expressions.
    """
    c = _c(col)
    no_prefix = F.regexp_replace(c, r"^hCoV-19/", "")
    return {
        "acc_no_prefix": no_prefix,
        "acc_state": F.regexp_extract(no_prefix, r"^USA/([A-Z]{2})-", 1),
        "acc_year": F.regexp_extract(no_prefix, r"/([0-9]{4})$", 1),
        "acc_middle": F.regexp_extract(no_prefix, r"^USA/[A-Z]{2}-(.*)/[0-9]{4}$", 1),
        "acc_no_punct": F.regexp_replace(no_prefix, r"[^A-Za-z0-9]", ""),
        "acc_digit_runs": F.regexp_extract_all(no_prefix, F.lit(r"([0-9]+)"), 1),
    }
