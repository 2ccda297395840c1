"""Tiered AC pattern generation — the watchlist index-build flatMap (F14).

Spark-native re-expression of the reference's high-recall AC generator
(``/root/reference/src/ai_service/layers/patterns/high_recall_ac_generator.py``:
document patterns :184-293, name tiers :346-1893, per-tier caps
:1906-1911/2087-2101, corpus build :2124-2206): an entities DataFrame flows
through an Arrow pandas UDF producing ``array<struct>`` of patterns, is
exploded (the UDTF shape, SURVEY.md §2.11), capped per (entity, tier) with a
window (A2), and lands in the same posting/shard pipeline as documents.

Tiers (reference semantics):
  0 — exact document identifiers (ITN / passport / IBAN variants), conf 1.0
  1 — canonical full names (casefolded, permuted), conf 0.9
  2 — derived variants (transliteration, gender, diminutives, initials), 0.8
  3 — partial names (surname-only, given-only), conf 0.5, requires context
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.normalize import casefold_by_language, detect_language, normalize_for_ac
from ..functions.tokenize import strip_noise_and_tokenize
from ..functions.translit import (
    gender_variants,
    resolve_diminutive,
    tag_role,
    translit_variants,
)

PATTERN_SCHEMA = StructType(
    [
        StructField("pattern", StringType()),
        StructField("canonical", StringType()),
        StructField("tier", IntegerType()),
        StructField("pattern_type", StringType()),
        StructField("lang", StringType()),
        StructField("confidence", DoubleType()),
        StructField("requires_context", BooleanType()),
    ]
)

TIER_LIMITS = {0: 3, 1: 8, 2: 12, 3: 200}  # high_recall_ac_generator.py:1906-1911

_ITN_RE = re.compile(r"\d{10,12}$")
_PASSPORT_RE = re.compile(r"([A-Za-z]{2})(\d{6})")
_IBAN_RE = re.compile(r"UA\d{2}[A-Z0-9]{25}$")


def _doc_patterns(itn: str | None, passport: str | None, iban: str | None):
    """Tier-0 identifier patterns with the reference's variant sets."""
    out = []
    if itn and _ITN_RE.match(itn):
        canon = normalize_for_ac(itn)
        out.append((canon, canon, 0, "tax_number", "numeric", 1.0, False))
    if passport:
        m = _PASSPORT_RE.match(passport.replace(" ", "").replace("-", ""))
        if m:
            letters, numbers = m.groups()
            canon = f"{letters.upper()}{numbers}"
            for variant in (
                canon,
                f"{letters.upper()}-{numbers}",
                f"{letters.upper()} {numbers}",
                f"{letters.lower()}{numbers}",
            ):
                out.append((variant, canon, 0, "passport", "mixed", 1.0, False))
    if iban:
        clean = re.sub(r"\s+", "", iban.upper())
        if _IBAN_RE.match(clean):
            spaced = " ".join(clean[i : i + 4] for i in range(0, len(clean), 4))
            for variant in (clean, spaced):
                out.append((variant, clean, 0, "iban", "mixed", 1.0, False))
    return out


def _name_patterns(name: str | None):
    """Tier 1-3 name patterns: canonical, permutations, variants, partials."""
    out = []
    if not name or not name.strip():
        return out
    lang = detect_language(name)
    canon = normalize_for_ac(name)
    if not canon:
        return out
    folded = casefold_by_language(canon, lang)
    tokens, _ = strip_noise_and_tokenize(canon, remove_stop_words=False)
    roles = [tag_role(t) for t in tokens]

    # tier 1: canonical + word-order permutation (surname-first ↔ given-first)
    out.append((folded, folded, 1, "full_name", lang, 0.9, False))
    if len(tokens) >= 2:
        permuted = casefold_by_language(
            " ".join([tokens[-1]] + tokens[:-1]), lang
        )
        if permuted != folded:
            out.append((permuted, folded, 1, "full_name_permuted", lang, 0.9, False))

    # tier 2: transliteration, gender flips, diminutive resolution, initials
    for v in translit_variants(canon):
        out.append(
            (casefold_by_language(v, lang), folded, 2, "translit", lang, 0.8, False)
        )
    surnames = [t for t, r in zip(tokens, roles) if r == "surname"]
    givens = [t for t, r in zip(tokens, roles) if r == "given"]
    for s in surnames:
        for gv in gender_variants(s):
            variant = folded.replace(s.lower(), gv.lower())
            out.append((variant, folded, 2, "gender_variant", lang, 0.8, False))
    for g in givens:
        resolved = resolve_diminutive(g)
        if resolved != g:
            variant = folded.replace(g.lower(), resolved.lower())
            out.append((variant, folded, 2, "diminutive", lang, 0.8, False))
    if givens and surnames:
        initials = " ".join([f"{g[0].lower()}." for g in givens] + [surnames[0].lower()])
        out.append((initials, folded, 2, "initials", lang, 0.8, True))

    # tier 3: partials (require context downstream)
    for s in surnames:
        out.append((s.lower(), folded, 3, "surname_only", lang, 0.5, True))
    for g in givens:
        out.append((g.lower(), folded, 3, "given_only", lang, 0.5, True))
    return out


def generate_patterns(entity: dict) -> list[tuple]:
    """All patterns for one entity row (pure function, unit-testable)."""
    out = _doc_patterns(
        entity.get("itn"), entity.get("passport"), entity.get("iban")
    )
    for field in ("name", "name_en"):
        out.extend(_name_patterns(entity.get(field)))
    for alias in entity.get("aliases") or []:
        out.extend(_name_patterns(alias))
    # dedup on (pattern, tier) keeping first (highest-priority source order)
    seen: set[tuple] = set()
    deduped = []
    for p in out:
        key = (p[0], p[2])
        if key not in seen:
            seen.add(key)
            deduped.append(p)
    return deduped


def generate_pattern_corpus(entities: DataFrame) -> DataFrame:
    """entities → exploded patterns DataFrame with per-(entity, tier) caps.

    Arrow pandas UDF (rows → array<struct>) + explode = the 1:N UDTF shape;
    the caps are a rank-deterministic window (A2)."""
    from pyspark.sql.pandas.functions import pandas_udf

    cols = entities.columns

    @pandas_udf(ArrayType(PATTERN_SCHEMA))
    def gen_udf(*series: pd.Series) -> pd.Series:
        frame = pd.DataFrame({c: s for c, s in zip(cols, series)})
        return pd.Series(
            [generate_patterns(row.to_dict()) for _, row in frame.iterrows()]
        )

    exploded = (
        entities.withColumn("patterns", gen_udf(*[F.col(c) for c in cols]))
        .select(
            F.col("id").alias("entity_id"),
            F.col("entity_type"),
            F.explode("patterns").alias("p"),
        )
        .select("entity_id", "entity_type", "p.*")
    )
    w = Window.partitionBy("entity_id", "tier").orderBy(
        F.desc("confidence"), F.asc("pattern")
    )
    capped = exploded.withColumn("rn", F.row_number().over(w))
    cap_expr = F.when(F.lit(False), F.lit(0))
    for tier, limit in TIER_LIMITS.items():
        cap_expr = cap_expr.when(F.col("tier") == tier, limit)
    return capped.where(F.col("rn") <= cap_expr.otherwise(200)).drop("rn")


def tier_distribution(patterns: DataFrame) -> DataFrame:
    """A1: tier → count histogram (prepare_sanctions_data.py:144-150)."""
    return patterns.groupBy("tier").agg(F.count("*").cast("long").alias("n"))
