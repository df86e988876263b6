"""Text analysis over the documents/pages tables (SURVEY build brief:
language-ID, quality scoring, token counting, fingerprinting).

Everything is built-in pyspark.sql.functions — JVM-side, codegen'd; no
Python in the hot path.  Each operator has a DuckDB-expressible analog
(see __spark_entry__.oracle_sql) using only portable functions
(length/replace/split/md5 — no engine-specific regex classes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "ja": ["no", "wa", "ni", "wo", "ga"],
}


def token_stats(docs: DataFrame, text_col="text", id_col="doc_id",
                keep_cols=()) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (chars/4 rule of
    thumb plus punctuation splits) + char count.  ``keep_cols``: extra
    columns carried through the projection — callers that need document
    attributes downstream (e.g. lang for a per-language rollup) pass them
    here instead of self-joining docs back on id (a narrow projection
    stays shuffle-free; the self-join costs two scans + an exchange per
    side, caught by the r4 plan audit)."""
    toks = F.expr(f"size(split({text_col}, ' +'))")
    chars = F.length(text_col)
    spaces = chars - F.length(F.regexp_replace(F.col(text_col), " ", ""))
    bpe_est = F.ceil(chars / F.lit(4.0)).cast("bigint")
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        chars.alias("n_chars"),
        toks.alias("n_tokens"),
        spaces.alias("n_spaces"),
        bpe_est.alias("n_bpe_est"),
    )


def quality_score(docs: DataFrame, text_col="text", id_col="doc_id",
                  lang_col="lang", keep_cols=()) -> DataFrame:
    """Heuristic quality features + a composite score:
    - mean word length (very long/short -> suspicious)
    - stopword ratio (natural text has a healthy share)
    - digit ratio, punct-ish ratio (replace-based counting — portable)

    ``keep_cols``: extra input columns carried through the projection
    (same pattern as token_stats/lang_id) — lets pipelines chain feature
    operators over ONE scan instead of re-joining docs per operator.
    """
    chars = F.length(text_col).cast("double")
    toks = F.expr(f"size(split({text_col}, ' +'))").cast("double")
    mean_word_len = chars / F.greatest(toks, F.lit(1.0))
    digits = (chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))).cast("double")
    stop_hits = None
    all_stops = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_hits = F.expr(
        "size(filter(split(lower({t}), ' +'), w -> array_contains(array({lst}), w)))".format(
            t=text_col, lst=", ".join(f"'{w}'" for w in all_stops)
        )
    ).cast("double")
    stop_ratio = stop_hits / F.greatest(toks, F.lit(1.0))
    digit_ratio = digits / F.greatest(chars, F.lit(1.0))
    score = (
        F.when((mean_word_len >= 3) & (mean_word_len <= 12), 0.4).otherwise(0.0)
        + F.when(stop_ratio >= 0.05, 0.4).otherwise(0.0)
        + F.when(digit_ratio <= 0.3, 0.2).otherwise(0.0)
    )
    return docs.select(
        F.col(id_col), F.col(lang_col),
        *[F.col(c) for c in keep_cols],
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(score, 2).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col="text", id_col="doc_id",
            keep_cols=()) -> DataFrame:
    """Stopword-marker language ID, shuffle-free: per-lang hit counts are
    ``size(filter(tokens, w -> w IN (...)))`` expressions evaluated row-
    local in the scan stage (no explode, no join — the whole operator is
    one narrow projection, so it scales linearly with no exchange).
    Predicted lang = argmax hits with deterministic tie-break (lang asc);
    zero hits -> 'und'.  Returns (doc_id, *keep_cols, pred_lang, hits).

    ``keep_cols``: extra document attributes carried through the
    projection (the same pattern as token_stats) — callers that need
    e.g. the labeled lang for an accuracy matrix ride the scan instead
    of self-joining docs back on id, which costs a second scan plus a
    join (r8 plan audit: the self-join was lang_id's whole join stage)."""
    langs = sorted(STOPWORDS)  # asc order = tie-break order
    # tokenize ONCE into a projected column (r8): higher-order functions
    # are interpreted (no codegen / no common-subexpression elimination),
    # so referencing split(lower(text)) inside each of the 5 filters
    # re-tokenized and re-lowercased every document 5x — measured 2.65 s
    # at sf1 where this operator is compute-bound.  Same expressions over
    # the same token array -> identical hit counts.
    toked = docs.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        F.expr(f"split(lower({text_col}), ' +')").alias("_toks"))
    hit_cols = [
        F.expr(
            "size(filter(_toks, w -> w IN ({ws})))".format(
                ws=", ".join(f"'{w}'" for w in STOPWORDS[lang])
            )
        ).alias(f"h_{lang}")
        for lang in langs
    ]
    d = toked.select(F.col(id_col), *[F.col(c) for c in keep_cols],
                     *hit_cols)
    total = sum(F.col(f"h_{la}") for la in langs)
    pred = F.when(total == 0, F.lit("und"))
    best = F.greatest(*[F.col(f"h_{la}") for la in langs])
    for la in langs:  # first (asc) lang achieving the max wins
        pred = pred.when(F.col(f"h_{la}") == best, F.lit(la))
    return d.select(
        F.col(id_col), *[F.col(c) for c in keep_cols],
        pred.alias("pred_lang"), best.cast("long").alias("hits")
    )


def fingerprint(docs: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Document fingerprints: md5 full-text hash + a rolling-hash sketch
    (min of 8-gram character window hashes — winnowing-style), both
    JVM-side."""
    grams = F.expr(
        f"CASE WHEN length({text_col}) < 8 THEN array({text_col}) "
        f"ELSE transform(sequence(1, length({text_col}) - 7), i -> substring({text_col}, i, 8)) END"
    )
    rolling_min = F.expr(
        f"array_min(transform(CASE WHEN length({text_col}) < 8 THEN array({text_col}) "
        f"ELSE transform(sequence(1, length({text_col}) - 7), i -> substring({text_col}, i, 8)) END, "
        f"g -> xxhash64(g)))"
    )
    return docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("md5"),
        rolling_min.alias("winnow_min"),
    )
