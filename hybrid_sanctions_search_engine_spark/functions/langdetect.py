"""Config-driven language detection — the reference's full decision cascade
as pure JVM Column expressions.

Re-expresses ``/root/reference/src/ai_service/layers/language/
language_detection_service.py::detect_language_config_driven`` (the
deterministic, langdetect-free path the service uses in production when the
optional model is absent) over Spark columns: character-class counts via
``regexp_count``, the ratio/threshold cascade as nested ``F.when``, the
ambiguous-Cyrillic pattern scorer as case-insensitive unicode regex counts.
No Python in the plan — a 100 TB corpus pass is one whole-stage-codegen
map.

Contract (mirrors the reference exactly; parity-fuzzed against the LIVE
service in tests/test_langdetect_parity.py):

1. empty/whitespace text → (unknown, 0.0, empty_text)
2. ≥ 70% non-alphabetic non-space chars → (unknown, 0.2, noisy_text)
3. < 3 alphabetic chars → (unknown, 0.3, short_text)
4. cyr/lat letter ratios vs config thresholds: both below → below_thresholds;
   close ratios above both → mixed; else the dominant script wins, with
   uk-vs-ru decided by marker characters (іїєґ vs ёъыэ) or — when tied —
   by the word-pattern/surname-suffix scorer (cyrillic_patterns_*).
5. bonuses: +0.05 per uk/ru marker char (capped 0.2 each); acronym penalty
   −0.4; final language → unknown when confidence < min_confidence.

Reference defaults (``config/settings.py::LanguageConfig``): min ratios
0.25, mixed gap 0.15, marker bonus 0.05, min confidence 0.55.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_CYR = "а-яёіїєґА-ЯЁІЇЄҐ"
_ALPHA = f"a-zA-Z{_CYR}"
_UK_MARKERS = "іїєґІЇЄҐ"
_RU_MARKERS = "ёъыэЁЪЫЭ"
_UPPER = "A-ZА-ЯЁІЇЄҐ"

# Behavioral data, not logic (same provenance policy as names_data.py /
# stopwords_data.py): the reference's _detect_cyrillic_language_patterns
# marker-word lists and surname suffixes, reproduced verbatim because the
# parity contract is defined over them (language_detection_service.py:
# 476-494).  The implementation around them is Spark-native.
_UK_WORDS = (
    "і|в|на|з|по|за|від|до|у|о|а|але|або|якщо|коли|де|як|що|хто|кошти|"
    "гроші|платіж|переказ|одержувач|отримувач"
)
_UK_WORDS2 = "був|була|були|бути|є|немає|це|той|ця|ці|усього|загалом"
_RU_WORDS = (
    "и|в|на|с|по|за|от|до|из|у|о|а|но|или|если|когда|где|как|что|кто|"
    "деньги|средства|перевод|платеж|оплата"
)
_RU_WORDS2 = "был|была|были|быть|есть|нет|это|тот|эта|эти"

_UK_SURNAME_SUFFIXES = (
    "енко", "енка", "чук", "чука", "юк", "юка", "ук", "ука",
    "ський", "ського", "цький", "цького", "зький", "зького", "ко", "ка",
)


def _surname_suffix_regex() -> str:
    """One alternation counting each capitalized Cyrillic word with a uk
    surname suffix ONCE (the reference counts words, not suffix hits): a
    word longer than the suffix (uppercase head + body + suffix) or a word
    that IS the suffix (uppercase first letter).  Both alternatives anchor
    at the same word start, so the engine counts at most one per word.

    Trailing boundary (round-6 ADVICE fix): the reference's word regex
    ``\\b[А-ЯІЇЄҐ][а-яіїєґА-ЯІЇЄҐ'-]+\\b`` ends at the greedy-backtracked
    position where Python's ``\\b`` holds, so a word counts iff the suffix
    sits at the end of its final LETTER block and any trailing ``'``/``-``
    run is followed by a non-word char or end of string ("Марченко- был" →
    1; "Марченко-Smith" → 0 because the captured word is "Марченко-";
    "Петренкоё" → 0 because ``\\b`` never holds before ``ё``).  A plain
    trailing ``\\b`` got the first two wrong; a bare ``(?![body])``
    lookahead gets the last two wrong (``['-]*`` backtracking sneaks past
    a following Latin letter).  ``(?!['-]*\\w)`` encodes the exact rule."""
    body = f"[а-яіїєґА-ЯІЇЄҐ'-]"
    longer = [
        f"[А-ЯІЇЄҐ]{body}*(?i:{suf})" for suf in _UK_SURNAME_SUFFIXES
    ]
    exact = [
        f"{suf[0].upper()}(?i:{suf[1:]})" for suf in _UK_SURNAME_SUFFIXES
    ]
    return "(?U)\\b(?:" + "|".join(longer + exact) + ")(?!['-]*\\w)"


_SURNAME_RE = _surname_suffix_regex()


@dataclass(frozen=True)
class LangConfig:
    """Mirror of the reference's LanguageConfig defaults."""

    min_cyr_ratio: float = 0.25
    min_lat_ratio: float = 0.25
    mixed_gap: float = 0.15
    prefer_uk_chars_bonus: float = 0.05
    prefer_ru_chars_bonus: float = 0.05
    min_confidence: float = 0.55


def _count_columns(text: Column) -> dict[str, Column]:
    """The character/pattern counts, each as ONE expression — callers that
    care about codegen materialize these as real columns first
    (``with_language``), because inlining every count into the full
    decision tree repeats each regexp dozens of times and blows the 64 KB
    generated-method limit (whole-stage codegen then silently falls back
    to interpreted eval — measured on the sf0.01 table)."""

    def count(pattern: str) -> Column:
        return F.regexp_count(text, F.lit(pattern)).cast("double")

    return {
        "total_chars": F.length(text).cast("double"),
        "alpha_len": count(f"[{_ALPHA}]"),
        # \x1c-\x1f: Python's \s counts the FS/GS/RS/US controls as
        # whitespace; Java's (?U)\s does not (round-6 ADVICE fix — the
        # empty/trim regexes below already handle them)
        "non_alpha": count(f"(?U)[^{_ALPHA}\\s\\x1c-\\x1f]"),
        "cyr": count(f"[{_CYR}]"),
        "lat": count("[a-zA-Z]"),
        "uk_chars": count(f"[{_UK_MARKERS}]"),
        "ru_chars": count(f"[{_RU_MARKERS}]"),
        "upper_chars": count(f"[{_UPPER}]"),
        "uk_matches": count(f"(?iU)\\b(?:{_UK_WORDS})\\b")
        + count(f"(?iU)\\b(?:{_UK_WORDS2})\\b"),
        "ru_matches": count(f"(?iU)\\b(?:{_RU_WORDS})\\b")
        + count(f"(?iU)\\b(?:{_RU_WORDS2})\\b"),
        "surnames": count(_SURNAME_RE),
    }


def with_language(
    df,
    text_col: str = "text",
    out_col: str = "lang_detect",
    config: LangConfig | None = None,
):
    """Corpus-scale form: adds ``out_col`` = struct(language, confidence,
    reason) to ``df``.  Counts materialize once as intermediate columns, so
    the decision tree references 11 attributes instead of re-inlining each
    regexp — the generated code stays under the JVM's 64 KB method limit
    and the stage keeps whole-stage codegen (Catalyst's CollapseProject
    does not re-inline non-cheap expressions referenced more than once)."""
    cfg = config or LangConfig()
    counts = _count_columns(F.col(text_col))
    tmp = {f"_ld_{k}": v for k, v in counts.items()}
    refs = {k: F.col(f"_ld_{k}") for k in counts}
    return (
        df.withColumns(tmp)
        .withColumn(out_col, _decision(F.col(text_col), refs, cfg))
        .drop(*tmp.keys())
    )


def detect_language_struct(
    text: Column, config: LangConfig | None = None
) -> Column:
    """→ struct(language, confidence, reason), the reference's
    config-driven result triple, as one JVM expression tree.  For full
    corpus passes prefer ``with_language`` (codegen-friendly)."""
    return _decision(text, _count_columns(text), config or LangConfig())


def _decision(
    text: Column, c: dict[str, Column], cfg: LangConfig
) -> Column:
    total_chars = c["total_chars"]
    alpha_len = c["alpha_len"]
    non_alpha = c["non_alpha"]
    cyr = c["cyr"]
    lat = c["lat"]
    uk_chars = c["uk_chars"]
    ru_chars = c["ru_chars"]
    upper_chars = c["upper_chars"]
    uk_matches = c["uk_matches"]
    ru_matches = c["ru_matches"]
    surnames = c["surnames"]

    total_letters = cyr + lat
    cyr_ratio = F.when(total_letters > 0, cyr / total_letters).otherwise(0.0)
    lat_ratio = F.when(total_letters > 0, lat / total_letters).otherwise(0.0)

    # ambiguous-Cyrillic pattern scorer (uk_chars == ru_chars branch)
    uk_score = uk_matches + surnames * 1.5
    ru_score = ru_matches
    pat_lang = (
        F.when(ru_score > uk_score, F.lit("ru"))
        .when(uk_score > ru_score, F.lit("uk"))
        .when(surnames > 0, F.lit("uk"))
        .otherwise(F.lit("ru"))
    )
    pat_conf = (
        F.when(ru_score > uk_score, F.least(F.lit(0.9), 0.7 + ru_matches * 0.05))
        .when(
            uk_score > ru_score,
            F.least(F.lit(0.9), 0.7 + uk_matches * 0.05 + surnames * 0.05),
        )
        .when(surnames > 0, F.least(F.lit(0.9), 0.8 + surnames * 0.05))
        .otherwise(F.lit(0.6))
    )
    pat_reason = (
        F.when(ru_score > uk_score, F.lit("cyrillic_patterns_russian"))
        .when(uk_score > ru_score, F.lit("cyrillic_patterns_ukrainian"))
        .when(surnames > 0, F.lit("cyrillic_surname_suffix"))
        .otherwise(F.lit("cyrillic_default_russian"))
    )

    below = (cyr_ratio < cfg.min_cyr_ratio) & (lat_ratio < cfg.min_lat_ratio)
    is_mixed = (
        (cyr_ratio >= cfg.min_cyr_ratio)
        & (lat_ratio >= cfg.min_lat_ratio)
        & (F.abs(cyr_ratio - lat_ratio) < cfg.mixed_gap)
    )

    base_lang = (
        F.when(below, F.lit("unknown"))
        .when(is_mixed, F.lit("mixed"))
        .when(
            cyr_ratio > lat_ratio,
            F.when(uk_chars > ru_chars, F.lit("uk"))
            .when(ru_chars > uk_chars, F.lit("ru"))
            .otherwise(pat_lang),
        )
        .otherwise(F.lit("en"))
    )
    base_conf = (
        F.when(below, F.lit(0.0))
        .when(is_mixed, F.least(cyr_ratio, lat_ratio))
        .when(
            cyr_ratio > lat_ratio,
            F.when(uk_chars > ru_chars, cyr_ratio)
            .when(ru_chars > uk_chars, cyr_ratio)
            .otherwise(pat_conf),
        )
        .otherwise(lat_ratio)
    )
    base_reason = (
        F.when(below, F.lit("below_thresholds"))
        .when(is_mixed, F.lit("mixed_candidate"))
        .when(
            cyr_ratio > lat_ratio,
            F.when(uk_chars > ru_chars, F.lit("cyrillic_ukrainian"))
            .when(ru_chars > uk_chars, F.lit("cyrillic_russian"))
            .otherwise(pat_reason),
        )
        .otherwise(F.lit("latin"))
    )

    # character bonuses (applied in every non-early-exit branch)
    conf = (
        base_conf
        + F.when(
            uk_chars > 0,
            F.least(uk_chars * cfg.prefer_uk_chars_bonus, F.lit(0.2)),
        ).otherwise(0.0)
        + F.when(
            ru_chars > 0,
            F.least(ru_chars * cfg.prefer_ru_chars_bonus, F.lit(0.2)),
        ).otherwise(0.0)
    )

    # acronym penalty: >90% uppercase, ≤10 letters, trimmed text is one
    # all-caps token
    # (?U): Python str.strip() removes UNICODE whitespace (NBSP, ideographic
    # space...) — Java \s is ASCII-only without the flag (review finding,
    # round 5: ' НАТО ' skipped the acronym penalty)
    trimmed = F.regexp_replace(
        text, F.lit(r"(?U)^[\s\x1c-\x1f]+|[\s\x1c-\x1f]+$"), F.lit("")
    )
    is_acronym = (
        (F.when(alpha_len > 0, upper_chars / alpha_len).otherwise(0.0) > 0.9)
        & (alpha_len <= 10)
        & trimmed.rlike(f"^[{_UPPER}]+$")
    )
    conf = F.when(is_acronym, F.greatest(F.lit(0.1), conf - 0.4)).otherwise(conf)

    # mixed override AFTER bonuses (recomputed from the raw ratios)
    lang = F.when(is_mixed, F.lit("mixed")).otherwise(base_lang)
    conf = F.when(
        is_mixed,
        F.least(F.greatest(cyr_ratio, lat_ratio) + 0.05, F.lit(0.95)),
    ).otherwise(conf)
    reason = F.when(is_mixed, F.lit("mixed_language")).otherwise(base_reason)

    # minimum-confidence floor flips the LANGUAGE, not the confidence
    lang = F.when(conf < cfg.min_confidence, F.lit("unknown")).otherwise(lang)
    reason = F.when(conf < cfg.min_confidence, F.lit("low_confidence")).otherwise(
        reason
    )
    conf = F.greatest(F.lit(0.0), F.least(F.lit(1.0), conf))

    # early exits (checked in the reference's order: empty → noisy → short)
    # unicode-aware emptiness: the reference's `not text.strip()` strips
    # unicode whitespace; F.trim strips only ASCII spaces, so tab/newline/
    # NBSP-only text diverged (review finding, round 5 — verified live)
    # \x1c-\x1f: Python str.isspace() counts the FS/GS/RS/US control chars
    # as whitespace; unicode \s does not
    empty = text.isNull() | (
        F.regexp_replace(text, F.lit(r"(?U)[\s\x1c-\x1f]+"), F.lit("")) == ""
    )
    noisy = (total_chars > 0) & (non_alpha / total_chars >= 0.7)
    short = alpha_len < 3
    final_lang = (
        F.when(empty, F.lit("unknown"))
        .when(noisy, F.lit("unknown"))
        .when(short, F.lit("unknown"))
        .otherwise(lang)
    )
    final_conf = (
        F.when(empty, F.lit(0.0))
        .when(noisy, F.lit(0.2))
        .when(short, F.lit(0.3))
        .otherwise(conf)
    )
    # note: the reference's early-exit `reason` strings differ from its
    # `method` labels — parity is against the reason field
    final_reason = (
        F.when(empty, F.lit("empty_text"))
        .when(noisy, F.lit("excessive_non_alphabetic_chars"))
        .when(short, F.lit("insufficient_alphabetic_chars"))
        .otherwise(reason)
    )
    return F.struct(
        final_lang.alias("language"),
        final_conf.alias("confidence"),
        final_reason.alias("reason"),
    )
