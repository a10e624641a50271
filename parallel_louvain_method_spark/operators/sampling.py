"""Deterministic dataset-curation sampling — train/val/test splits and
stratified subsets for training-data pipelines.

A 100 TB corpus is never split by ``df.randomSplit`` in production: the
assignment must be a PURE FUNCTION of a stable row id so that (a) the
split is reproducible run-to-run and resume-to-resume, (b) a document
keeps its split when the corpus is re-read, re-partitioned, or grown
(new ids land in splits at the configured rates without reshuffling old
ones), and (c) no row is ever in two splits.  Both operators here hash
the id with the same overflow-free integer mix as
:mod:`..walks` (LCG-style, all arithmetic inside ±2^63), so any SQL
engine replays the assignment exactly — no ``rand()``, no Spark-version
dependence, no sampling-state to checkpoint.

The reference has no sampling operators; these are north-rule additions
to the LLM-data-pipeline family (splits and per-stratum caps are the
curation steps between dedup and training).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .walks import _A, _B, _C, _M


def _bucket(id_col, seed: int, buckets: int):
    """Deterministic bucket in [0, buckets): the walks-module integer mix
    of (id, seed) reduced twice — pure codegen, replayable in SQL."""
    return F.pmod(
        F.pmod(
            F.col(id_col) * F.lit(_A) + F.lit((seed * _C + _B) % _M),
            F.lit(_M),
        ),
        F.lit(buckets),
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: tuple[int, ...] = (98, 1, 1),
    labels: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of ``labels``
    with integer ``weights`` (parts per ``sum(weights)``), as a pure
    function of ``df[id_col]`` and ``seed``.

    Weights are integers so the bucket boundaries are exact: a row lands
    in split i iff ``bucket(id) ∈ [cum_i, cum_i + w_i)`` over
    ``sum(weights)`` buckets.  Ids must be non-negative integers below
    ~2^31 (the overflow-free bound of the integer mix — densify wider
    ids first, same bound as the walk generators); a wider id fails
    LOUDLY under Spark's ANSI overflow check rather than silently
    mis-bucketing.
    """
    if len(weights) != len(labels):
        raise ValueError("hash_split: weights and labels must align")
    if len(weights) < 2:
        raise ValueError("hash_split needs at least 2 splits")
    if any(not isinstance(w, int) or w <= 0 for w in weights):
        raise ValueError("hash_split requires positive integer weights")
    total = sum(weights)
    if total >= (1 << 20):
        raise ValueError("hash_split: sum(weights) must stay below 2^20")

    b = _bucket(id_col, seed, total)
    expr = None
    cum = 0
    for w, lab in zip(weights, labels):
        cond = b < F.lit(cum + w)
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(
            cond, F.lit(lab)
        )
        cum += w
    return df.withColumn("split", expr)


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Keep a deterministic pseudo-random sample of at most ``k`` rows
    per stratum: rank rows within each ``strata_col`` group by the
    id-hash (ties broken by id — total order, so the kept set is unique)
    and keep ranks 1..k.

    This is the balanced-mixture cap (e.g. at most k documents per
    language / per domain) used when a few strata dominate the corpus.
    The per-stratum window sorts only within a stratum — skew guidance:
    a mega-stratum's sort is the inherent cost of an exact global top-k;
    when approximate suffices, pre-filter with
    ``hash_split``-style bucketing first.
    """
    if k < 1:
        raise ValueError("stratified_topk requires k >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        _bucket(id_col, seed, _M).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
