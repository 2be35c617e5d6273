"""Scalar cleaning / derivation functions (SURVEY.md §2.3, F1–F16).

Every function the reference implements as a row-at-a-time Python
`apply`/`applymap` lambda is re-expressed here as a native Catalyst column
expression — codegen'd JVM-side, no Python boundary, vectorized, and fused
into a single projection by `CollapseProject` when chained (the reference
runs three separate whole-table passes for F2–F4;
reference mdrm_data_collect_process.py:161-167).

Citation convention: `MDRM:<line>` = reference
`python/mdrm_data_dictionary_collect_process/mdrm_data_collect_process.py`,
`CONV` = `python/sas_xport_converter/converter.py`,
`CDR` = `python/cdr_taxonomy_xbrl_to_json/cdr_taxonomy_processor.py`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _c(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- F1: strip HTML tags (reference MDRM:92-97) -----------------------------
def strip_html(c: ColumnOrName) -> Column:
    """Remove `<...>` tags: re.sub('<[^<]+?>', '', s)."""
    return F.regexp_replace(_c(c), "<[^<]+?>", "")


# --- F2: delete literal '&#x0D;' (reference MDRM:60-73) ---------------------
def bad_char_replace(c: ColumnOrName) -> Column:
    return F.regexp_replace(_c(c), "&#x0D;", "")


# --- F3: delete carriage returns (reference MDRM:84-89) ---------------------
def remove_cr(c: ColumnOrName) -> Column:
    return F.regexp_replace(_c(c), "\r", "")


# --- F4: collapse double newlines (reference MDRM:76-81) --------------------
def newline_collapse(c: ColumnOrName) -> Column:
    return F.regexp_replace(_c(c), "\n\n", "\n")


def clean_text(c: ColumnOrName) -> Column:
    """The reference's full text-cleaning chain F1→F2→F3→F4 as ONE fused
    expression (vs. three whole-table applymap passes, MDRM:157-167)."""
    return newline_collapse(remove_cr(bad_char_replace(strip_html(c))))


# --- F5: item-type code → label (reference MDRM:189-193) --------------------
ITEM_TYPE_LABELS = {
    "J": "Projected",
    "D": "Derived",
    "F": "Financial reported",
    "R": "Rate",
    "S": "Structure",
    "E": "Examination/Supervision Data",
    "P": "Percentage",
}


def item_type_label(c: ColumnOrName) -> Column:
    """7-entry literal map lookup. Constant-folded by Catalyst; for large
    dictionaries use a broadcast-join lookup table instead (scalable form)."""
    pairs: list[Column] = []
    for k, v in ITEM_TYPE_LABELS.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)[_c(c)]


# --- F6: 'Y'/'N' flag → boolean (reference MDRM:196) ------------------------
def yn_flag(c: ColumnOrName) -> Column:
    return _c(c) == F.lit("Y")


# --- F7: mdrm key = mnemonic + item_code (reference MDRM:205) ---------------
def mdrm_key(mnemonic: ColumnOrName, item_code: ColumnOrName) -> Column:
    return F.concat(_c(mnemonic), _c(item_code))


# --- F8: comma list → array, null-safe (reference MDRM:211) -----------------
def split_to_array(c: ColumnOrName, sep: str = ",") -> Column:
    """`s.split(sep)` with non-string → [] (the reference's lambda default)."""
    col = _c(c)
    return F.when(col.isNull(), F.array().cast("array<string>")).otherwise(F.split(col, sep))


# --- F9: '%m/%d/%Y %H:%M:%S %p' → yyyymmdd (reference MDRM:29-39) -----------
MDRM_DATE_FMT = "M/d/yyyy h:mm:ss a"


def mdrm_date_to_yyyymmdd(c: ColumnOrName) -> Column:
    return F.date_format(F.to_timestamp(_c(c), MDRM_DATE_FMT), "yyyyMMdd")


# Sentinel meaning "still active" (reference component README:21-22).
ACTIVE_SENTINEL_YYYYMMDD = "99991231"


# --- F10: NaN → NULL (reference MDRM:42-57) ---------------------------------
def nan_to_null(c: ColumnOrName) -> Column:
    col = _c(c)
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


# --- F11: roleRef href → (form_number, quarter) (reference CDR:114-117) -----
def report_form_number(href: ColumnOrName) -> Column:
    """'...FFIEC 031-2022-06-30.xsd' style id → form number token."""
    base = F.split(F.element_at(F.split(_c(href), "/"), -1), "\\.").getItem(0)
    return F.element_at(F.split(base, "-"), 1)


def report_quarter(href: ColumnOrName) -> Column:
    base = F.split(F.element_at(F.split(_c(href), "/"), -1), "\\.").getItem(0)
    return F.concat_ws("-", F.slice(F.split(base, "-"), 2, 3))


# --- F12: 2-token prefix key (reference CDR:253) ----------------------------
def prefix_key(c: ColumnOrName, tokens: int = 2, sep: str = "_") -> Column:
    return F.concat_ws(sep, F.slice(F.split(_c(c), sep), 1, tokens))


# --- F13: typed casts (reference CONV:162/168/175) --------------------------
def cast_long(c: ColumnOrName) -> Column:
    return _c(c).cast("bigint")


def cast_double(c: ColumnOrName) -> Column:
    return _c(c).cast("double")


def cast_string(c: ColumnOrName) -> Column:
    return _c(c).cast("string")


# --- F14: truthy-bool normalize (reference CONV:154-157) --------------------
def truthy_bool(c: ColumnOrName) -> Column:
    """value ∈ {1, True, 'true', 'True', 'TRUE', '1'} → True else False."""
    s = F.lower(_c(c).cast("string"))
    return s.isin("1", "true", "1.0")


# --- F15: array helpers (reference CONV:47 sorted, CDR:204/222 reversed) ----
array_sort = F.array_sort
array_reverse = F.reverse
