"""Fuzzy candidate gating + rescoring — the reference's escalation stage 2.

Re-expresses (from scratch, as JVM Column plans) the reference's fuzzy
machinery:
  * candidate generation = ES ``fuzzy`` query, fuzziness=1, prefix_length=2,
    max_expansions=20 (``hybrid_search_service.py:2287-2329``) → here a
    prefix-bucketed dictionary join + ``F.levenshtein`` filter (no cross
    join: candidates must share the 2-char prefix, exactly like ES's
    prefix_length pruning — at web scale this join hits one dictionary
    bucket per query term).
  * verification + score normalization (``hybrid_search_service.py:2354-2409``):
    edit-distance cap (≤3 below 15 chars, len/5 above), score =
    0.2·es_norm + 0.5·edit_ratio + 0.3·word_jaccard, ×0.7 penalty when
    edit_ratio < 0.6, drop below 0.4/0.5 threshold.
  * anchor boosts (``hybrid_search_service.py:1032-1089``): DoB ×1.3,
    ID ×1.2 when extracted query anchors appear in the candidate.
  * tier boosts (``elasticsearch_adapters.py:447-466``).

Everything is built-in Spark functions — fully codegen'd, no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# L6: fuzzy candidate generation (prefix-bucketed Levenshtein join)
# ---------------------------------------------------------------------------

def fuzzy_term_candidates(
    dictionary: DataFrame,
    query_term: str,
    max_edits: int = 1,
    prefix_len: int = 2,
    max_expansions: int = 20,
) -> DataFrame:
    """Dictionary terms within ``max_edits`` of ``query_term`` sharing its
    ``prefix_len``-char prefix; capped at ``max_expansions`` by ascending
    edit distance (ES tie-break: then by term).

    ``dictionary`` needs a ``term`` column (e.g. ``term_doc_freq`` output).
    """
    q = query_term.lower()
    prefix = q[:prefix_len]
    return (
        dictionary.where(F.col("term").startswith(prefix))
        .withColumn("edit_dist", F.levenshtein(F.col("term"), F.lit(q)))
        .where(F.col("edit_dist") <= max_edits)
        .orderBy(F.asc("edit_dist"), F.asc("term"))
        .limit(max_expansions)
    )


# ---------------------------------------------------------------------------
# L7: edit-distance verification + conservative score normalization
# ---------------------------------------------------------------------------

def fuzzy_rescore(
    candidates: DataFrame,
    query_text: str,
    text_col: str = "text",
    raw_score_col: str = "score",
) -> DataFrame:
    """Apply the reference's client-side fuzzy verification to candidate rows.

    Adds ``edit_dist, edit_ratio, word_sim, fuzzy_score`` and filters exactly
    like the reference: edit cap, 0.2/0.5/0.3 blend, ×0.7 low-ratio penalty,
    0.4/0.5 minimum threshold.
    """
    q = query_text.lower()
    max_edits = 3 if len(q) < 15 else max(3, len(q) // 5)
    qlen = F.lit(len(q))
    text_lower = F.lower(F.col(text_col))

    q_words = F.array_distinct(F.split(F.lit(q), r"\s+"))
    c_words = F.array_distinct(F.split(text_lower, r"\s+"))
    inter = F.size(F.array_intersect(q_words, c_words))
    union = F.size(F.array_union(q_words, c_words))

    out = (
        candidates.withColumn("edit_dist", F.levenshtein(text_lower, F.lit(q)))
        .withColumn(
            "edit_ratio",
            F.when(
                F.greatest(qlen, F.length(text_lower)) > 0,
                1.0 - F.col("edit_dist") / F.greatest(qlen, F.length(text_lower)),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "word_sim",
            F.when(union > 0, inter / union).otherwise(F.lit(0.0)),
        )
        .where(F.col("edit_dist") <= max_edits)
        .withColumn(
            "es_norm", F.least(F.col(raw_score_col) / 50.0, F.lit(1.0))
        )
        .withColumn(
            "fuzzy_score",
            (
                F.col("es_norm") * 0.2
                + F.col("edit_ratio") * 0.5
                + F.col("word_sim") * 0.3
            )
            * F.when(F.col("edit_ratio") < 0.6, 0.7).otherwise(1.0),
        )
        .where(
            F.col("fuzzy_score")
            >= F.when(F.col("edit_ratio") > 0.8, 0.4).otherwise(0.5)
        )
    )
    return out


# ---------------------------------------------------------------------------
# L8-analogue: multi-measure similarity blend (rapidfuzz-style), JVM-side
# ---------------------------------------------------------------------------

def similarity_blend(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    out_col: str = "sim_score",
) -> Column | DataFrame:
    """Weighted blend of three similarity measures over string-pair rows —
    the Spark-native counterpart of the reference's rapidfuzz fusion
    (``fuzzy_search_service.py:46-49``: ratio 0.3 / partial 0.25 /
    token_sort 0.25 / token_set 0.2).  partial_ratio needs quadratic
    substring alignment the JVM can't express, so its weight is renormalized
    across the other three (0.4 / 0.333 / 0.267):

      * char ratio        — Levenshtein similarity of the raw strings
      * token-sort ratio  — Levenshtein similarity after sorting tokens
      * token-set Jaccard — set overlap of distinct tokens
    """
    a = F.lower(F.col(left_col))
    b = F.lower(F.col(right_col))
    char_ratio = 1.0 - F.levenshtein(a, b) / F.greatest(
        F.length(a), F.length(b), F.lit(1)
    )
    ta = F.array_distinct(F.split(a, r"\s+"))
    tb = F.array_distinct(F.split(b, r"\s+"))
    sa = F.concat_ws(" ", F.array_sort(F.split(a, r"\s+")))
    sb = F.concat_ws(" ", F.array_sort(F.split(b, r"\s+")))
    token_sort_ratio = 1.0 - F.levenshtein(sa, sb) / F.greatest(
        F.length(sa), F.length(sb), F.lit(1)
    )
    jac = F.size(F.array_intersect(ta, tb)) / F.greatest(
        F.size(F.array_union(ta, tb)), F.lit(1)
    )
    return pairs.withColumn(
        out_col, char_ratio * 0.4 + token_sort_ratio * (1.0 / 3.0) + jac * (0.8 / 3.0)
    )


def partial_ratio_series(left: "pd.Series", right: "pd.Series") -> "pd.Series":
    """Best-window similarity of the shorter string inside the longer — the
    canonical fuzzywuzzy/rapidfuzz ``partial_ratio`` algorithm (matching
    blocks seed candidate windows; each window scored with a sequence
    ratio).  Pure stdlib difflib, deterministic (autojunk off)."""
    import pandas as pd
    from difflib import SequenceMatcher

    def pr(s1: str, s2: str) -> float:
        s1, s2 = (s1 or "").lower(), (s2 or "").lower()
        if not s1 or not s2:
            return 1.0 if s1 == s2 else 0.0
        shorter, longer = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
        m = SequenceMatcher(None, shorter, longer, autojunk=False)
        best = 0.0
        for i, j, _n in m.get_matching_blocks():
            start = max(j - i, 0)
            window = longer[start : start + len(shorter)]
            r = SequenceMatcher(None, shorter, window, autojunk=False).ratio()
            if r > best:
                best = r
            if best == 1.0:
                break
        return best

    return pd.Series([pr(a, b) for a, b in zip(left, right)])


def similarity_blend_full(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    out_col: str = "sim_score",
    name_boost_col: Column | None = None,
) -> DataFrame:
    """The reference's 4-measure rapidfuzz fusion with the exact weights
    (``fuzzy_search_service.py:46-49, 175-310``): ratio 0.3 / partial_ratio
    0.25 / token_sort 0.25 / token_set 0.2.  token_set uses the canonical
    fuzzywuzzy construction — max similarity over (intersection,
    intersection+rest_a, intersection+rest_b) — so a token-subset pair
    scores 1.0 like the reference, not a Jaccard fraction.  The char
    measures use Levenshtein-normalized similarity (rapidfuzz normalizes
    InDel distance; the JVM ships Levenshtein — documented approximation).
    partial_ratio (quadratic substring alignment) runs as an Arrow pandas
    UDF over the already-pruned candidate pairs — the one place Python is
    allowed, per the repo rule."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def partial_udf(a, b):
        return partial_ratio_series(a, b)

    def _lev_ratio(p, q):
        return 1.0 - F.levenshtein(p, q) / F.greatest(
            F.length(p), F.length(q), F.lit(1)
        )

    x = F.lower(F.col(left_col))
    y = F.lower(F.col(right_col))
    char_ratio = _lev_ratio(x, y)
    ta = F.array_sort(F.array_distinct(F.split(x, r"\s+")))
    tb = F.array_sort(F.array_distinct(F.split(y, r"\s+")))
    sa = F.concat_ws(" ", F.array_sort(F.split(x, r"\s+")))
    sb = F.concat_ws(" ", F.array_sort(F.split(y, r"\s+")))
    token_sort_ratio = _lev_ratio(sa, sb)
    inter = F.array_sort(F.array_intersect(ta, tb))
    t0 = F.concat_ws(" ", inter)
    t1 = F.trim(F.concat_ws(" ", F.concat(inter, F.array_sort(F.array_except(ta, tb)))))
    t2 = F.trim(F.concat_ws(" ", F.concat(inter, F.array_sort(F.array_except(tb, ta)))))
    token_set_ratio = F.greatest(
        _lev_ratio(t0, t1), _lev_ratio(t0, t2), _lev_ratio(t1, t2)
    )
    blend = (
        char_ratio * 0.3
        + partial_udf(F.col(left_col), F.col(right_col)) * 0.25
        + token_sort_ratio * 0.25
        + token_set_ratio * 0.2
    )
    if name_boost_col is not None:
        # reference name boost: ×1.2 for person-name candidates, capped at
        # 1.0 (fuzzy_search_service.py:59, 300-303)
        blend = F.when(
            name_boost_col, F.least(blend * 1.2, F.lit(1.0))
        ).otherwise(blend)
    return pairs.withColumn(out_col, blend)


def _make_partial_udf():
    """Module-level partial-ratio Arrow UDF, built once: constructing a new
    ``pandas_udf`` per rerank call gave every batch a fresh UDF identity, so
    no two invocations could ever share plan fragments (and each shipped a
    newly pickled closure)."""
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def partial_udf(a, b):
        return partial_ratio_series(a, b)

    return partial_udf


_PARTIAL_UDF = None


def _partial_udf():
    global _PARTIAL_UDF
    if _PARTIAL_UDF is None:
        _PARTIAL_UDF = _make_partial_udf()
    return _PARTIAL_UDF


def rapidfuzz_rerank_expr(
    candidates: DataFrame,
    query_col,
    text_col: str = "text",
    score_col: str = "score",
    sort: bool = True,
) -> DataFrame:
    """L9 rerank with the query as a COLUMN (per-row query text — the batched
    msearch ladder joins each hit with its own query string): fuzz =
    max(ratio, partial_ratio, token_sort_ratio) on a 0-100 scale; score ×1.2
    when fuzz > 80, ×1.1 when fuzz > 60.  ratio/token_sort are JVM Columns;
    partial_ratio is the Arrow UDF over the (small) candidate set."""
    partial_udf = _partial_udf()

    q = F.lower(query_col)
    t = F.lower(F.col(text_col))
    ratio = (
        1.0 - F.levenshtein(q, t) / F.greatest(F.length(q), F.length(t), F.lit(1))
    ) * 100.0
    sq = F.concat_ws(" ", F.array_sort(F.split(q, r"\s+")))
    st = F.concat_ws(" ", F.array_sort(F.split(t, r"\s+")))
    token_sort = (
        1.0 - F.levenshtein(sq, st) / F.greatest(F.length(sq), F.length(st), F.lit(1))
    ) * 100.0
    partial = partial_udf(query_col, F.col(text_col)) * 100.0
    fuzz = F.greatest(ratio, partial, token_sort)
    boosted = (
        F.when(fuzz > 80, F.col(score_col) * 1.2)
        .when(fuzz > 60, F.col(score_col) * 1.1)
        .otherwise(F.col(score_col))
    )
    out = candidates.withColumn("fuzz_score", fuzz).withColumn(
        score_col, boosted
    )
    # sort=False skips the global sort exchange when the caller re-ranks
    # driver-side anyway (the batched ladder collects then fuses)
    return out.orderBy(F.desc(score_col)) if sort else out


def rapidfuzz_rerank(
    candidates: DataFrame,
    query_text: str,
    text_col: str = "text",
    score_col: str = "score",
) -> DataFrame:
    """L9: the reference's vector-fallback reranking
    (``hybrid_search_service.py:990-1030``) for a single query string."""
    return rapidfuzz_rerank_expr(
        candidates, F.lit(query_text), text_col=text_col, score_col=score_col
    )


# ---------------------------------------------------------------------------
# L10: DoB / ID anchor boosts
# ---------------------------------------------------------------------------

_DATE_RES = [
    re.compile(r"\b(\d{4}-\d{2}-\d{2})\b"),
    re.compile(r"\b(\d{2}\.\d{2}\.\d{4})\b"),
    re.compile(r"\b(\d{1,2}/\d{1,2}/\d{4})\b"),
]
_ID_RE = re.compile(r"\b(\d{8,12})\b")


def extract_anchors(query_text: str) -> tuple[list[str], list[str]]:
    """Driver-side DoB/ID extraction from the query string."""
    dates: list[str] = []
    for rx in _DATE_RES:
        dates.extend(rx.findall(query_text))
    ids = [m for m in _ID_RE.findall(query_text)]
    return dates, ids


def anchor_boost(
    candidates: DataFrame,
    query_text: str,
    text_col: str = "text",
    score_col: str = "score",
    dob_boost: float = 1.3,
    id_boost: float = 1.2,
) -> DataFrame:
    """×1.3 when a query date appears in the candidate, ×1.2 for an ID."""
    dates, ids = extract_anchors(query_text)
    score = F.col(score_col)
    if dates:
        has_date = F.lit(False)
        for d in dates:
            has_date = has_date | F.col(text_col).contains(d)
        score = F.when(has_date, score * dob_boost).otherwise(score)
    if ids:
        has_id = F.lit(False)
        for i in ids:
            has_id = has_id | F.col(text_col).contains(i)
        score = F.when(has_id, score * id_boost).otherwise(score)
    return candidates.withColumn(score_col, score)


# ---------------------------------------------------------------------------
# L11: tier boosts + tier-ordered retrieval
# ---------------------------------------------------------------------------

def tier_boost(
    candidates: DataFrame,
    tier_col: str = "tier",
    score_col: str = "score",
    tier0: float = 2.0,
    tier1: float = 1.5,
) -> DataFrame:
    return candidates.withColumn(
        score_col,
        F.col(score_col)
        * F.when(F.col(tier_col) == 0, tier0)
        .when(F.col(tier_col) == 1, tier1)
        .otherwise(1.0),
    )
