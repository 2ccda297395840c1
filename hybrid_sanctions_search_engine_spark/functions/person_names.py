"""Person-name extraction + normalization pipeline (F8 role FSM + F11 assembly).

Re-expresses the behavior of the reference's role tagger + normalization
service (``/root/reference/src/ai_service/layers/normalization/
role_tagger_service.py``, ``processors/role_classifier.py``) as a compact
token FSM, validated end-to-end against the reference's own 31 golden cases
(``/root/reference/tests/golden_cases/golden_cases.json`` →
tests/test_golden_cases.py):

    text → unicode scrub → persona-group segmentation (commas /
    conjunctions / org+noise skipping) → per-token role tagging
    (initial / given / patronymic / surname / title / legal-form /
    context / garbage) → per-role to-nominative morphology →
    language policy assembly (RU/UK keep token order + initials;
    EN keeps first given + surname, resolves nicknames).

Pure Python core (``extract_personas``) + an Arrow pandas UDF wrapper for
Spark (``personas_series``) — the same two-layer shape as normalize.py.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

from . import morphology as M
from .names_data import (
    EN_SUFFIXES,
    EN_TITLES,
    LEGAL_FORMS,
    PAYMENT_CONTEXT,
    STOPWORDS_EN,
    STOPWORDS_RU,
    STOPWORDS_UK,
)

# Cyrillic titles / honorifics / role words that precede names (reference
# role_tagger_service person-context behavior)
TITLES_CYR = {
    "гражданин", "гражданка", "громадянин", "громадянка", "пан", "пані",
    "господин", "госпожа", "президент", "директор", "міністр", "министр",
    "доктор", "професор", "профессор",
}
# genitive country/geo tokens swallowed after a title (uk_ner_gate)
GEO_TOKENS = {
    "україни", "украины", "рф", "росії", "россии", "украина", "україна",
    "беларуси", "білорусі",
}
# document/identifier label words preceding ids (uk_passport golden)
DOC_WORDS = {
    "паспорт", "passport", "документ", "посвідчення", "удостоверение",
    "инн", "інн", "іпн", "едрпоу", "єдрпоу", "огрн", "огрнип", "окпо",
    "iban", "swift", "itn", "inn", "edrpou", "ogrn", "vat", "id",
}
CONJUNCTIONS = {"и", "та", "й", "і", "and", "und", "et"}

_DATE_RE = re.compile(r"\(?\b\d{4}-\d{2}-\d{2}\b\)?|\(?\b\d{2}[./]\d{2}[./]\d{4}\b\)?")
_ID_RE = re.compile(r"\b[A-ZА-ЯІЇЄҐ]{2}\s?\d{6,}\b|\b\d{8,}\b")
_QUOTED_RE = re.compile(r'["«„”][^"«»„”]*["»”]')
_INITIAL_RE = re.compile(r"^[A-ZА-ЯЁІЇЄҐ]\.$")
_GLUED_INITIALS_RE = re.compile(r"^([A-ZА-ЯЁІЇЄҐ]\.){2,}$")


def detect_lang(text: str) -> str:
    low = text.lower()
    if any(c in M.UK_ONLY for c in low):
        return "uk"
    if any("а" <= c <= "я" or c == "ё" for c in low):
        return "ru"
    return "en"


def _title_case(token: str, lang: str) -> str:
    """Capitalize including after apostrophes/hyphens (Д'яченко → Д'Яченко);
    EN normalizes the apostrophe to U+2019 (reference golden en_apostrophe)."""
    if M.script_of(token) == "mixed":
        return token  # homoglyph token: preserve byte-for-byte (ru_homoglyph)
    apos = "’" if lang == "en" else "'"
    norm = token.replace("’", "'")
    parts_h = []
    for hp in norm.split("-"):
        parts_a = [p[:1].upper() + p[1:].lower() if p else p for p in hp.split("'")]
        parts_h.append(apos.join(parts_a))
    return "-".join(parts_h)


def _is_noise(tok: str, lang: str) -> bool:
    low = tok.lower().rstrip(".:;")
    if not any(ch.isalpha() for ch in tok):
        return True
    if (
        low in PAYMENT_CONTEXT
        or low in LEGAL_FORMS
        or low in TITLES_CYR
        or low in GEO_TOKENS
        or low in DOC_WORDS
    ):
        return True
    if lang == "en" and (low in EN_TITLES or low in EN_SUFFIXES or low in STOPWORDS_EN):
        return True
    if lang == "ru" and low in STOPWORDS_RU:
        return True
    if lang == "uk" and (low in STOPWORDS_UK or low in STOPWORDS_RU):
        return True
    # single-letter function words / prepositions (mixed_function_words)
    if len(low) <= 2 and low in {
        "и", "в", "у", "о", "к", "з", "с", "на", "по", "за", "до", "та", "й",
        "із", "of", "at", "in", "on", "to", "by",
    }:
        return True
    return False


def _tag(tok: str, lang: str, prev_role: str | None) -> str:
    """FSM token classifier → role in {initial, given, patronymic, surname,
    skip}."""
    if _INITIAL_RE.match(tok) or _GLUED_INITIALS_RE.match(tok):
        return "initial"
    # a Capitalized known given name beats context-word noise ("Bill" is both
    # a payment word and a nickname; the capitalized form reads as the name)
    if tok[:1].isupper() and M.is_given_name(tok, lang):
        return "given"
    if _is_noise(tok, lang):
        return "skip"
    if not tok[0].isalpha() and not tok[0] in "'’":
        return "skip"
    if lang in ("ru", "uk"):
        if M.script_of(tok) == "lat":
            return "skip"  # declared-cyrillic text: latin tokens are noise
        if M.is_patronymic(tok):
            return "patronymic"
        if M.is_given_name(tok, lang):
            return "given"
        if M.is_surname_like(tok) or M.script_of(tok) == "mixed":
            return "surname"
        # capitalized unknown next to a person token reads as a surname
        if tok[:1].isupper() and prev_role in ("given", "patronymic", "initial", None):
            return "surname"
        return "skip"
    # en
    if M.is_given_name(tok, lang):
        return "given"
    if tok[:1].isupper() or "'" in tok or "’" in tok:
        return "surname"
    return "skip"


def _split_groups(text: str, lang: str) -> list[list[str]]:
    """Segment into persona groups on commas / conjunctions, with the
    surname-comma-given inversion special case (en_apostrophe golden)."""
    text = _DATE_RE.sub(" ", text)
    text = _ID_RE.sub(" ", text)
    text = _QUOTED_RE.sub(" ", text)
    text = text.replace("→", " ").replace("?", " ")
    raw_groups = [g for g in re.split(r"[,;]", text)]
    groups: list[list[str]] = []
    for g in raw_groups:
        toks: list[str] = []
        for tok in g.split():
            tok = tok.strip("()[]{}:;«»\"„”")
            if not tok:
                continue
            # conjunctions appear lowercase in running text; "И." here is an
            # initial, not "и"
            if tok.islower() and tok.lower() in CONJUNCTIONS:
                if toks:
                    groups.append(toks)
                toks = []
                continue
            toks.append(tok)
        if toks:
            groups.append(toks)
    return groups


def extract_personas(text: str, lang: str = "auto") -> list[dict]:
    """→ list of personas: {normalized, tokens: [(text, role)], language,
    gender}.  The reference pipeline's output essentials (golden cases)."""
    if not text or not text.strip():
        return []
    text = unicodedata.normalize("NFKC", text)
    doc_lang = detect_lang(text) if lang in (None, "", "auto") else lang
    groups = _split_groups(text, doc_lang)

    # comma-inversion: exactly two single-token groups "Surname, Given"
    if len(groups) == 2 and len(groups[0]) == 1 and len(groups[1]) == 1:
        g_lang0 = detect_lang(groups[0][0]) if lang in (None, "", "auto") else doc_lang
        if _tag(groups[1][0], g_lang0, None) == "given" and _tag(
            groups[0][0], g_lang0, None
        ) in ("surname", "given"):
            groups = [[groups[1][0], groups[0][0]]]

    personas = []
    for toks in groups:
        # per-group language (mixed_languages golden: auto text, one latin +
        # one cyrillic persona)
        g_lang = (
            detect_lang(" ".join(toks)) if lang in (None, "", "auto") else doc_lang
        )
        tagged: list[tuple[str, str]] = []
        prev: str | None = None
        for tok in toks:
            role = _tag(tok, g_lang, prev)
            if role == "initial" and _GLUED_INITIALS_RE.match(tok):
                for ch in tok.replace(".", ""):
                    tagged.append((ch + ".", "initial"))
                prev = "initial"
                continue
            if role != "skip":
                tagged.append((tok, role))
                prev = role
        if not any(r in ("given", "surname") for _, r in tagged):
            continue

        # gender from the given name (drives surname disambiguation)
        gender = None
        for tok, role in tagged:
            if role == "given":
                gender = M.given_gender(tok, g_lang)
                if gender:
                    break

        out_tokens: list[tuple[str, str]] = []
        for tok, role in tagged:
            if role == "given":
                norm = M.given_to_nominative(tok, g_lang)
            elif role == "patronymic":
                norm = M.patronymic_to_nominative(tok)
            elif role == "surname" and g_lang in ("ru", "uk"):
                norm = M.surname_to_nominative(tok, gender)
            else:
                norm = tok
            out_tokens.append((_title_case(norm, g_lang), role))

        if g_lang == "en":
            givens = [t for t, r in out_tokens if r == "given"]
            surnames = [t for t, r in out_tokens if r == "surname"]
            kept = []
            if givens:
                kept.append((givens[0], "given"))
            if surnames:
                kept.append((surnames[-1], "surname"))
            elif len(givens) > 1:
                kept.append((givens[-1], "surname"))
            out_tokens = kept
        if not out_tokens:
            continue
        personas.append(
            {
                "normalized": " ".join(t for t, _ in out_tokens),
                "tokens": out_tokens,
                "language": g_lang,
                "gender": gender,
            }
        )
    return personas


def normalize_persons(text: str, lang: str = "auto") -> list[str]:
    return [p["normalized"] for p in extract_personas(text, lang)]


def tag_tokens(text: str, lang: str = "auto") -> list[tuple[str, str]]:
    """Role trace for EVERY token (the reference role tagger's debug
    surface): given | surname | patronymic | initial | legal_form | org |
    title | context | geo | date_or_id | other.  Person roles agree with
    ``extract_personas`` (same FSM); non-person tokens get the reason they
    were skipped."""
    if not text or not text.strip():
        return []
    text = unicodedata.normalize("NFKC", text)
    doc_lang = detect_lang(text) if lang in (None, "", "auto") else lang
    out: list[tuple[str, str]] = []
    prev: str | None = None
    for raw in text.split():
        tok = raw.strip("()[]{}:;«»\"„”,")
        if not tok:
            continue
        low = tok.lower().rstrip(".:;")
        if _DATE_RE.match(tok) or _ID_RE.match(tok):
            out.append((raw, "date_or_id"))
            continue
        if low in LEGAL_FORMS:
            out.append((raw, "legal_form"))
            prev = None
            continue
        if raw.startswith(('"', "«", "„")) or raw.isupper() and raw.strip('"«»„”').isalpha() and len(raw) > 4 and prev == "legal_form":
            out.append((raw, "org"))
            continue
        if low in TITLES_CYR or (doc_lang == "en" and low in EN_TITLES):
            out.append((raw, "title"))
            prev = None
            continue
        if doc_lang == "en" and low in EN_SUFFIXES:
            out.append((raw, "suffix"))
            continue
        if low in GEO_TOKENS:
            out.append((raw, "geo"))
            continue
        if low in PAYMENT_CONTEXT or low in DOC_WORDS:
            out.append((raw, "context"))
            prev = None
            continue
        role = _tag(tok, doc_lang, prev)
        if role == "skip":
            out.append((raw, "other"))
        else:
            out.append((raw, role))
            prev = role
    return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def personas_series(texts: pd.Series, langs: pd.Series | None = None) -> pd.Series:
    """Arrow-batch driver: Series[str] → Series[list[str]] of normalized
    personas (wrap with pandas_udf(ArrayType(StringType())))."""
    if langs is None:
        return texts.fillna("").map(normalize_persons)
    return pd.Series(
        [normalize_persons(t, lg) for t, lg in zip(texts.fillna(""), langs.fillna("auto"))]
    )
