"""String-cleaning Column builders (SURVEY §2.7 F1-F3, §1.2 NA semantics).

All pure Spark column expressions — no Python row UDFs — so they stay
inside whole-stage codegen and are pushdown/prune friendly.

Reference semantics reproduced (see /root/reference):
  - NA-string vocabulary read as null
    (scripts/Roster_scripts/ROSTER_COMPILE.Rmd:154,
     docs/notebooks/scripts/functions.R:48-58)
  - name normalization chain kill/destroy/smash/annihilate
    (scripts/Roster_scripts/quality_filters.R:5-14)
  - NA-safe name concat / flipped-name variant
    (docs/notebooks/fuzzy.Rmd:525-528,575-576)
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Strings treated as null at ingestion (ROSTER_COMPILE.Rmd:154 plus the
#: extended list in functions.R:48-58).
NA_STRINGS = ["", "NA", "N/A", "None", "NONE", "n/a", "na", "NULL", "null"]


def normalize_na(col: Column | str, na_strings: Iterable[str] = NA_STRINGS) -> Column:
    """Map any NA-vocabulary string (after trim) to NULL."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed.isin(list(na_strings)), F.lit(None)).otherwise(c)


def normalize_na_df(df: DataFrame, cols: Iterable[str] | None = None,
                    na_strings: Iterable[str] = NA_STRINGS) -> DataFrame:
    """Apply :func:`normalize_na` to every (string) column in one pass."""
    target = list(cols) if cols is not None else [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    ]
    return df.withColumns({c: normalize_na(c, na_strings) for c in target})


# --- name normalization chain (quality_filters.R:5-14) -----------------
# kill:    non-alphanumerics -> space
# trim:    strip outer whitespace, collapse runs
# destroy: drop a trailing single-letter initial ("JANE Q" -> "JANE")
# smash:   remove all spaces
# annihilate: uppercase of all of the above

def kill(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[^a-zA-Z0-9]", " ")


def destroy(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), r" [a-zA-Z]$", "")


def smash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r" ", "")


def annihilate(col: Column | str) -> Column:
    """Full normalization used on both sides of the fuzzy match."""
    return F.upper(smash(destroy(kill(col))))


def name_concat(*cols: Column | str, sep: str = "_") -> Column:
    """NA-safe concat (R `unite(..., na.rm=TRUE)` — concat_ws skips nulls)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)


def name_flip(first: Column | str, last: Column | str, sep: str = "_") -> Column:
    """LAST_FIRST variant for the flipped-name fuzzy join (fuzzy.Rmd:575-576)."""
    return name_concat(last, first, sep=sep)


def strip_prefix(col: Column | str, prefix: str = "hCoV-19/") -> Column:
    """F3: remove a literal prefix + trim (ROSTER_COMPILE.Rmd:91-98)."""
    c = F.col(col) if isinstance(col, str) else col
    import re
    return F.trim(F.regexp_replace(c, "^" + re.escape(prefix), ""))
