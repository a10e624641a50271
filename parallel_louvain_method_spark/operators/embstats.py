"""Embedding-column statistics — the vector-side curation primitives a
training-data pipeline runs between dedup and training: per-dimension
moments (drift / normalization checks), the covariance matrix (whitening
/ PCA prep), PCA projection, and int8 scalar quantization (vector-store
export).

Scale design, per operator:

- **moments** — ``posexplode`` multiplies rows by ``dim`` but every term
  stays inside whole-stage codegen and the hash aggregation is map-side
  combined, so the shuffle is ``dim`` rows per task regardless of input
  size.  No Python anywhere.
- **gram / covariance** — the one genuinely matrix-shaped pass:
  per-Arrow-batch ``X.T @ X`` inside ``mapInPandas`` (the UDF budget's
  vectorized path — one BLAS call per batch, never per-row Python),
  emitting ``dim*(dim+1)/2`` partial rows per batch; a map-side-combined
  SUM folds partials into the global Gram matrix.  Shuffle volume is
  O(partitions * dim^2), independent of row count — the same partial
  aggregation a 1000-executor covariance job needs.
- **pca_project** — eigendecomposition happens on the DRIVER on the
  dim x dim covariance (dim <= a few thousand: trivially driver-sized
  even at 100 TB input), components ship back as a broadcast literal,
  and the projection is a codegen ``aggregate(zip_with(...))`` dot
  product per component — no Python in the per-row path.
- **quantize** — per-dimension max-abs symmetric int8: the scale pass is
  the moments aggregation, the quantize pass is pure expressions.  All
  arithmetic is order-INSENSITIVE (MAX, division, half-away-from-zero
  ROUND), so the output is bit-exact reproducible and SQL-replayable —
  the gate hashes raw quantized values with no rounding slack.

The reference has no vector surface; these are north-rule additions to
the LLM-data-pipeline family alongside operators/similarity.py (which
consumes the same ``array<float>`` column this module audits/compresses).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _dim_of(df: DataFrame, vec_col: str, dim: int | None) -> int:
    if dim is not None:
        return dim
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError("embstats: cannot infer dim from an empty table")
    return int(row["d"])


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension count / mean / population variance:
    ``DataFrame[pos: int, n: long, mean: double, var: double]``
    (``pos`` 0-based).  One posexplode + one map-side-combined hash
    aggregation — ``dim`` rows out, pure codegen."""
    x = F.col("x").cast("double")
    return (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.avg(x).alias("mean"),
            (F.avg(x * x) - F.avg(x) * F.avg(x)).alias("var"),
        )
    )


def embedding_gram(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Upper-triangular Gram matrix ``DataFrame[i: int, j: int, s: double]``
    with ``s = sum over rows of x_i * x_j`` (i <= j), via per-batch
    ``X.T @ X`` partials in ``mapInPandas`` + a global SUM.  NULL / wrong-
    length vectors are dropped (counted rows only carry full vectors)."""
    d = _dim_of(df, vec_col, dim)
    iu = np.triu_indices(d)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        seen = False
        for b in batches:
            vecs = [
                v for v in b["v"] if v is not None and len(v) == d
            ]
            if not vecs:
                continue
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            acc += X.T @ X
            seen = True
        if seen:
            yield pd.DataFrame(
                {"i": iu[0], "j": iu[1], "s": acc[iu]}
            )

    part = df.select(F.col(vec_col).alias("v")).mapInPandas(
        partials, schema="i int, j int, s double"
    )
    return part.groupBy("i", "j").agg(F.sum("s").alias("s"))


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Population covariance matrix (upper triangle):
    ``DataFrame[i: int, j: int, cov: double]`` with
    ``cov = E[x_i x_j] - E[x_i] E[x_j]`` — the Gram pass joined to the
    per-dimension means (a ``dim``-row broadcast)."""
    d = _dim_of(df, vec_col, dim)
    gram = embedding_gram(df, vec_col, d)
    mom = embedding_moments(df, vec_col).select(
        "pos", "n", "mean"
    )
    mi = mom.select(
        F.col("pos").alias("i"),
        F.col("n").alias("n"),
        F.col("mean").alias("mean_i"),
    )
    mj = mom.select(F.col("pos").alias("j"), F.col("mean").alias("mean_j"))
    return (
        gram.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.col("s") / F.col("n")
                - F.col("mean_i") * F.col("mean_j")
            ).alias("cov"),
        )
    )


def pca_project(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Project each vector onto the top-``k`` principal components:
    ``DataFrame[id, proj: array<double>]`` (component order = descending
    eigenvalue; each component's SIGN is canonicalized so its
    largest-|coefficient| entry is positive — eigenvectors are otherwise
    sign-ambiguous and a rerun could flip them).

    The covariance is assembled distributed (see
    :func:`embedding_covariance`), collected at its driver-sized
    ``dim x dim`` shape, eigendecomposed with ``numpy.linalg.eigh``, and
    the components return as broadcast literals inside codegen dot
    products — the per-row path is pure JVM expressions.
    """
    d = _dim_of(df, vec_col, dim)
    if not 1 <= k <= d:
        raise ValueError(f"pca_project: k must be in [1, {d}]")
    rows = embedding_covariance(df, vec_col, d).collect()
    C = np.zeros((d, d))
    for r in rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    w, V = np.linalg.eigh(C)  # ascending eigenvalues
    comps = V[:, ::-1][:, :k]  # columns = top-k components
    # canonical sign: largest-|coeff| entry positive (ties: lowest index,
    # np.argmax's first-max rule)
    for c in range(k):
        lead = int(np.argmax(np.abs(comps[:, c])))
        if comps[lead, c] < 0:
            comps[:, c] = -comps[:, c]
    mean = np.zeros(d)
    for r in embedding_moments(df, vec_col).collect():
        mean[r["pos"]] = r["mean"]
    return project_embeddings(
        df,
        [list(map(float, comps[:, c])) for c in range(k)],
        list(map(float, mean)),
        id_col=id_col,
        vec_col=vec_col,
    )


def project_embeddings(
    df: DataFrame,
    components: list[list[float]],
    mean: list[float] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The distributed half of :func:`pca_project`, public so any fixed
    basis can be applied (and so the gate can pin the projection algebra
    with literal components independent of the driver-side eigh):
    center by ``mean`` (default none) and dot with each component via
    codegen ``aggregate(zip_with(...))`` left folds — per-row pure JVM,
    components ship as broadcast literals.
    ``DataFrame[id, proj: array<double>]``."""
    if not components:
        raise ValueError("project_embeddings: components must be non-empty")
    if mean is not None:
        centered = F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(float(m)) for m in mean]),
            lambda x, m: x.cast("double") - m,
        )
    else:
        centered = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    projs = [
        F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(v)) for v in comp]),
                lambda x, p: x * p,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for comp in components
    ]
    return df.select(F.col(id_col).alias("id"), F.array(*projs).alias("proj"))


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Symmetric per-dimension int8 quantization: returns
    ``(quantized, scales)`` where ``quantized = DataFrame[id, pos, q]``
    (``q = round(x / scale_pos)`` clamped to [-127, 127], ``pos``
    0-based) and ``scales = DataFrame[pos, scale]`` with
    ``scale = max|x| / 127`` (the dequantize table).

    Every step is order-insensitive (MAX, division, ROUND half-away-
    from-zero) so the result is bit-exact reproducible and replayable in
    any SQL engine — no rounding slack needed to gate it.  An all-zero
    dimension gets scale 0 and q 0 (``try_divide`` NULL -> 0).
    """
    x = F.col("x").cast("double")
    scales = (
        df.select(F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("pos")
        .agg((F.max(F.abs(x)) / F.lit(127.0)).alias("scale"))
    )
    exploded = df.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("pos", "x")
    )
    q = F.round(F.try_divide(F.col("x").cast("double"), F.col("scale")), 0)
    quantized = exploded.join(F.broadcast(scales), "pos").select(
        "id",
        "pos",
        F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.coalesce(q, F.lit(0.0)).cast("int")),
        ).alias("q"),
    )
    return quantized, scales
