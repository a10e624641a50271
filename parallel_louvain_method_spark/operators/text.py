"""Text analysis operators for training-data pipelines — all built-in
column expressions (JVM-side, whole-stage codegen; zero Python in the hot
path), each SQL-expressible for DuckDB oracle checks.

- token counting: whitespace tokens + a BPE-ish regex token count
  (word pieces / numbers / punctuation runs);
- quality scoring: length, punctuation ratio, stopword ratio, mean word
  length — composed into a [0, 1] score;
- language ID: stopword-hit heuristic over a tiny built-in lexicon
  (en/es/de/fr) — an n-gram-free heuristic that stays in one expression;
- fingerprinting: rolling-hash (Karp-Rabin-style) document fingerprint =
  min of 8-gram hashes, a winnowing-lite content id that is robust to small
  appends (unlike sha256).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_STOPWORDS = {
    "en": ["the", "of", "and", "to", "in", "is", "it", "that", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"],
    "de": ["der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(text_col: str) -> Column:
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``[doc_id, ws_tokens, bpe_tokens, chars]``."""
    return docs.select(
        "doc_id",
        F.size(_words(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_ISH), 0)).alias(
            "bpe_tokens"
        ),
        F.length(text_col).alias("chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``[doc_id, n_words, punct_ratio, stop_ratio, mean_word_len, quality]``.

    quality ∈ [0,1]: length band · (1 − punct excess) · stopword presence —
    the standard cheap pre-filter shape for web-scale corpora.
    """
    words = _words(text_col)
    n_words = F.size(words)
    n_chars = F.length(text_col)
    punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(w) for w in _STOPWORDS["en"]]),
        )
    )
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop_hits / F.lit(float(len(_STOPWORDS["en"])))
    mean_wl = (n_chars - (n_words - 1)) / F.greatest(n_words, F.lit(1))
    len_band = F.when((n_words >= 10) & (n_words <= 100000), 1.0).otherwise(0.3)
    quality = (
        len_band
        * (F.lit(1.0) - F.least(punct_ratio * 2, F.lit(1.0)))
        * (F.lit(0.5) + F.least(stop_ratio, F.lit(0.5)))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        mean_wl.alias("mean_word_len"),
        quality.alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``[doc_id, lang_pred, lang_score]`` — argmax of per-language stopword
    hits; 'und' (undetermined) when nothing matches.  Deterministic
    tie-break: language list order."""
    words = F.array_distinct(_words(text_col))
    scores = [
        F.size(
            F.array_intersect(words, F.array(*[F.lit(w) for w in sw]))
        ).alias(f"s_{lang}")
        for lang, sw in _STOPWORDS.items()
    ]
    scored = docs.select("doc_id", *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(f"s_{l}") for l in langs])
    pred = F.lit("und")
    # reversed: earlier languages win ties by overwriting later in the chain
    for l in reversed(langs):
        pred = F.when(F.col(f"s_{l}") == best, F.lit(l)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return scored.select("doc_id", pred.alias("lang_pred"), best.alias("lang_score"))


def fingerprints(docs: DataFrame, text_col: str = "text", gram: int = 8) -> DataFrame:
    """``[doc_id, fingerprint]`` — min hash over character ``gram``-grams
    (rolling-hash style content id; equal for docs sharing their minimal
    8-gram, robust to small edits elsewhere)."""
    n = F.greatest(F.length(text_col) - gram + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.substring(F.col(text_col), i, gram)
    )
    return docs.select(
        "doc_id",
        F.array_min(F.transform(grams, lambda g: F.xxhash64(g))).alias("fingerprint"),
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 1
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document —
    ``[doc_id, term, tf, tfidf, rnk]``.

    The classic training-data-pipeline keyword extractor: term frequency
    from the whitespace tokenizer (same ``_words`` seam as
    ``token_counts``), document frequency across the corpus, and
    ``tfidf = tf · ln(N / df)`` with N = distinct documents in the input.
    Ranking within a doc is ``tfidf DESC, tf DESC, term ASC`` — fully
    deterministic (the integer tie-breaks resolve equal-score terms
    without depending on float ordering of identical values).

    Scale shape: one explode (row count = token count, the same shape a
    tokenizer stage already pays), two map-side-combined aggregations,
    one broadcast-able join of the |vocab|-row df table, and one window
    partitioned BY DOCUMENT (bounded by per-doc vocabulary, never a
    global sort).  N rides as a broadcast 1-row cross join, engine
    convention (operators/louvain.py A6).
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("tfidf_top_terms requires k >= 1")
    tok = docs.select(
        "doc_id", F.explode(_words(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    nn = docs.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "term",
            "tf",
            (
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            F.round("tfidf", 8).alias("tfidf"),
            "rnk",
        )
    )
