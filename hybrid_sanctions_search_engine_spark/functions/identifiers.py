"""Identifier checksum validation (D2 depth) as pure Column arithmetic.

Re-expresses the reference's check-digit algorithms
(``/root/reference/src/ai_service/data/patterns/identifiers.py:328-455``:
RU/UA INN, EDRPOU, OGRN, OGRNIP) as JVM Column expressions — SQL-expressible,
so the driver oracles them against DuckDB.  Screening uses these to reject
any-10-digit-run false positives before anchor boosting (reference behavior:
``get_validation_function``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _digit(col: Column, pos: int) -> Column:
    """1-indexed digit of a numeric string as int."""
    return F.substring(col, pos, 1).cast("int")


def _wsum(col: Column, weights: list[int]) -> Column:
    out = F.lit(0)
    for i, w in enumerate(weights):
        out = out + _digit(col, i + 1) * F.lit(w)
    return out


def _is_digits(col: Column, n: int) -> Column:
    return col.rlike(f"^[0-9]{{{n}}}$")


def inn_ru10_valid(col: Column) -> Column:
    """Russian 10-digit INN (legal entities): weighted sum mod 11 (mod 10 if
    >9) equals the 10th digit."""
    cd = _wsum(col, [2, 4, 10, 3, 5, 9, 4, 6, 8]) % 11
    cd = F.when(cd > 9, cd % 10).otherwise(cd)
    return _is_digits(col, 10) & (_digit(col, 10) == cd)


def inn_ru12_valid(col: Column) -> Column:
    """Russian 12-digit INN (individuals): two check digits."""
    cd1 = _wsum(col, [7, 2, 4, 10, 3, 5, 9, 4, 6, 8]) % 11
    cd1 = F.when(cd1 > 9, cd1 % 10).otherwise(cd1)
    cd2 = _wsum(col, [3, 7, 2, 4, 10, 3, 5, 9, 4, 6, 8]) % 11
    cd2 = F.when(cd2 > 9, cd2 % 10).otherwise(cd2)
    return _is_digits(col, 12) & (_digit(col, 11) == cd1) & (_digit(col, 12) == cd2)


def inn_ua10_valid(col: Column) -> Column:
    """Ukrainian 10-digit INN (individuals): sum of first 9 digits mod 10
    equals the 10th digit."""
    s = _wsum(col, [1] * 9) % 10
    return _is_digits(col, 10) & (_digit(col, 10) == s)


def inn_valid(col: Column) -> Column:
    """Reference ``validate_inn``: Russian algorithms first, Ukrainian as
    fallback; accepts 10- or 12-digit strings."""
    return (
        F.when(_is_digits(col, 10), inn_ru10_valid(col) | inn_ua10_valid(col))
        .when(_is_digits(col, 12), inn_ru12_valid(col))
        .otherwise(F.lit(False))
    )


def edrpou_valid(col: Column) -> Column:
    """Ukrainian EDRPOU: 6 digits pass on length; 8 digits check-digit with
    the 1..7 weights, alternative 3..9 weights when the first sum mod 11
    exceeds 9, and 0 when both do."""
    cd1 = _wsum(col, [1, 2, 3, 4, 5, 6, 7]) % 11
    cd2 = _wsum(col, [3, 4, 5, 6, 7, 8, 9]) % 11
    cd = F.when(cd1 <= 9, cd1).otherwise(F.when(cd2 <= 9, cd2).otherwise(F.lit(0)))
    return (
        F.when(_is_digits(col, 6), F.lit(True))
        .when(_is_digits(col, 8), _digit(col, 8) == cd)
        .otherwise(F.lit(False))
    )


def ogrn_valid(col: Column) -> Column:
    """Russian OGRN (13 digits): first 12 digits mod 11, 10 → 0, equals the
    13th digit."""
    cd = F.substring(col, 1, 12).cast("long") % 11
    cd = F.when(cd == 10, F.lit(0)).otherwise(cd)
    return _is_digits(col, 13) & (_digit(col, 13) == cd)


def ogrnip_valid(col: Column) -> Column:
    """Russian OGRNIP (15 digits): first 14 digits mod 13, ≥10 → mod 10,
    equals the 15th digit."""
    cd = F.substring(col, 1, 14).cast("long") % 13
    cd = F.when(cd >= 10, cd % 10).otherwise(cd)
    return _is_digits(col, 15) & (_digit(col, 15) == cd)


def duckdb_checksum_sql(expr: str, kind: str) -> str:
    """The identical arithmetic as DuckDB SQL over a string expression
    (driver-oracle mirror; digits via substr+CAST)."""
    def d(pos: int) -> str:
        return f"CAST(substr({expr}, {pos}, 1) AS INT)"

    def wsum(weights: list[int]) -> str:
        return " + ".join(f"{d(i + 1)} * {w}" for i, w in enumerate(weights))

    if kind == "inn_ru10":
        cs = f"({wsum([2, 4, 10, 3, 5, 9, 4, 6, 8])}) % 11"
        return (
            f"(regexp_matches({expr}, '^[0-9]{{10}}$') AND {d(10)} = "
            f"(CASE WHEN {cs} > 9 THEN ({cs}) % 10 ELSE {cs} END))"
        )
    if kind == "inn_ua10":
        return (
            f"(regexp_matches({expr}, '^[0-9]{{10}}$') AND {d(10)} = "
            f"({wsum([1] * 9)}) % 10)"
        )
    if kind == "edrpou8":
        cs1 = f"({wsum([1, 2, 3, 4, 5, 6, 7])}) % 11"
        cs2 = f"({wsum([3, 4, 5, 6, 7, 8, 9])}) % 11"
        cd = (
            f"(CASE WHEN {cs1} <= 9 THEN {cs1} "
            f"WHEN {cs2} <= 9 THEN {cs2} ELSE 0 END)"
        )
        return f"(regexp_matches({expr}, '^[0-9]{{8}}$') AND {d(8)} = {cd})"
    if kind == "ogrn13":
        cs = f"CAST(substr({expr}, 1, 12) AS BIGINT) % 11"
        return (
            f"(regexp_matches({expr}, '^[0-9]{{13}}$') AND {d(13)} = "
            f"(CASE WHEN {cs} = 10 THEN 0 ELSE {cs} END))"
        )
    raise ValueError(kind)
