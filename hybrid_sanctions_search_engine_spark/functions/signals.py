"""Signals extraction: dates, identifiers, query sanitization, redaction.

Spark Column expressions for the reference's signals layer (SURVEY.md §2.9):
date extraction D1 (``hybrid_search_service.py:1041-1059``), identifier
extraction D2 (``data/patterns/identifiers.py``, essentials), birthdate ISO
normalization D3 (``signals_service.py:1382-1400``), query sanitization P5
(``hybrid_search_service.py:1686-1715``) and sensitive-field redaction P6
(``:1743-1771``). All JVM-side regexp engines — no Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# D1: date patterns (ISO, European dotted, slashed)
DATE_PATTERNS = [
    r"\b(\d{4}-\d{2}-\d{2})\b",
    r"\b(\d{2}\.\d{2}\.\d{4})\b",
    r"\b(\d{1,2}/\d{1,2}/\d{4})\b",
]

# D2: identifier patterns (the reference's suite, re-derived; context-gated
# patterns follow identifiers.py:93-101 OGRN/OGRNIP shapes)
ID_PATTERNS: dict[str, str] = {
    "inn_12": r"\b(\d{12})\b",           # RU personal INN
    "inn_10": r"\b(\d{10})\b",           # RU org INN / UA IPN
    "edrpou": r"\b(\d{8})\b",            # UA EDRPOU
    "passport": r"\b([A-Z]{2}\d{6})\b",  # AA123456
    "iban_ua": r"\b(UA\d{2}[A-Z0-9]{25})\b",
    "swift": r"\b([A-Z]{6}[A-Z0-9]{2}(?:[A-Z0-9]{3})?)\b",
    "ogrn": r"\b(?:ОГРН|огрн|OGRN|ogrn)[:\s]*(\d{13})\b",
    "ogrnip": r"\b(?:ОГРНИП|огрнип|OGRNIP|ogrnip)[:\s]*(\d{15})\b",
    "vat_eu": r"\b([A-Z]{2}\d{8,12})\b",
}

# kinds whose candidates must also pass check-digit validation before they
# count as ID anchors (rejects any-10-digit-run false positives — the
# reference's get_validation_function gating)
CHECKSUM_KINDS = {"inn_12", "inn_10", "edrpou", "ogrn"}


def id_checksum_valid_col(kind: str, value_col: Column) -> Column:
    """Check-digit validation per kind (functions.identifiers); kinds without
    a checksum always pass."""
    from .identifiers import edrpou_valid, inn_ru12_valid, inn_valid, ogrn_valid

    if kind == "inn_10":
        return inn_valid(value_col)
    if kind == "inn_12":
        return inn_ru12_valid(value_col)
    if kind == "edrpou":
        return edrpou_valid(value_col)
    if kind == "ogrn":
        return ogrn_valid(value_col)
    return F.lit(True)


def extract_dates_col(text_col: Column) -> Column:
    """All date-like substrings (any of the three formats) → array<string>."""
    parts = [F.regexp_extract_all(text_col, F.lit(p), 1) for p in DATE_PATTERNS]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def extract_ids_col(
    text_col: Column, kinds: list[str] | None = None, validate: bool = True
) -> Column:
    """Identifier matches as array<struct<kind,value>>.

    With ``validate=True`` (default), candidates of CHECKSUM_KINDS must pass
    their check-digit algorithm — an arbitrary 10-digit run no longer
    anchors a screening boost (D2 false-positive fix)."""
    kinds = kinds or list(ID_PATTERNS)
    def _tagger(kind_name: str):
        # NB: a `kind=kind` default arg would make Spark treat this as a
        # two-parameter array lambda; close over the name instead
        return lambda v: F.struct(F.lit(kind_name).alias("kind"), v.alias("value"))

    def _checker(kind_name: str):
        return lambda v: id_checksum_valid_col(kind_name, v)

    structs = []
    for kind in kinds:
        matches = F.regexp_extract_all(text_col, F.lit(ID_PATTERNS[kind]), 1)
        if validate and kind in CHECKSUM_KINDS:
            matches = F.filter(matches, _checker(kind))
        structs.append(F.transform(matches, _tagger(kind)))
    out = structs[0]
    for s in structs[1:]:
        out = F.concat(out, s)
    return out


def normalize_birthdate_col(raw_col: Column) -> Column:
    """D3: normalize DD.MM.YYYY / DD/MM/YYYY / YYYY-MM-DD → ISO date (null
    when unparseable); mirrors the reference's multi-format attempts."""
    return F.coalesce(
        F.try_to_timestamp(raw_col, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(raw_col, F.lit("dd.MM.yyyy")).cast("date"),
        F.try_to_timestamp(raw_col, F.lit("d/M/yyyy")).cast("date"),
    )


# P5: query sanitization (driver-side, queries are single strings)
_TAG_CHARS_RE = re.compile(r"[<>\"']")
_SQLI_RE = re.compile(
    r"(?i)\b(union\s+select|drop\s+table|insert\s+into|delete\s+from)\b"
)
MAX_QUERY_LEN = 1000


def sanitize_query(query: str) -> str:
    """Strip tag chars, cap length, remove SQL-injection fragments."""
    if not query:
        return ""
    q = _TAG_CHARS_RE.sub("", query)
    q = _SQLI_RE.sub(" ", q)
    q = re.sub(r"\s+", " ", q)
    return q[:MAX_QUERY_LEN].strip()


# P6: sensitive-data redaction
def redact_columns(
    df: DataFrame, cols: list[str], replacement: str = "[REDACTED]"
) -> DataFrame:
    """Mask sensitive columns in result sets (reference drops/masks
    itn/passport-like fields before returning to clients)."""
    out = df
    for c in cols:
        if c in df.columns:
            out = out.withColumn(
                c, F.when(F.col(c).isNotNull(), F.lit(replacement))
            )
    return out


def mask_ids_in_text_col(text_col: Column) -> Column:
    """Replace identifier-looking substrings inside free text."""
    out = text_col
    for pattern in ID_PATTERNS.values():
        out = F.regexp_replace(out, pattern, "[ID]")
    return out
