"""Synthetic Kronecker (Graph500 RMAT) edge source — SURVEY.md S3.

The reference DECLARES this source and never implements it:
``g.from_kronecker(scale, edgefactor, seed)`` is called from the dead
Graph500 BFS driver (``/root/reference/src/main_distributed_bfs.cpp:74-80``)
but has no body anywhere in graphlib and the binary is excluded from the
build (``/root/reference/src/CMakeLists.txt:10-13``).  This module is the
from-scratch Spark realization of that declared surface: the standard
RMAT recursive-quadrant generator (Chakrabarti, Zhan & Faloutsos, SDM'04;
Graph500 specification parameters A=0.57 B=0.19 C=0.19 D=0.05).

Spark-first design — and why it scales to 10^12 edges:

- ``spark.range(num_edges)`` is the only input: an embarrassingly
  parallel splittable source with NO shuffle, NO I/O, and NO Python.
  Each task materializes its own id slab; 1000 executors generate 1000
  slabs independently.
- Every per-edge coin flip is a whole-stage-codegen integer expression.
  For level ``l`` the quadrant is chosen by a pairwise-independent hash
  ``h = (a_l * (id + 1) + b_l) mod (2^31 - 1)`` compared against the
  PRECOMPUTED integer thresholds ``floor(A * M)`` / ``floor((A+B) * M)``
  / ``floor((A+B+C) * M)`` — integer-only algebra, so the stream is
  bit-exact reproducible on any engine (the DuckDB oracle replays it
  verbatim) and products stay below 2^62 (ANSI-safe: Spark 4 raises on
  long overflow rather than wrapping).
- The per-level coefficients ``(a_l, b_l)`` derive from a SplitMix64
  stream keyed by the user seed (the house pattern from the MinHash
  permutations, ``operators/dedup.py:_splitmix64``), computed ONCE in
  Python and embedded as literals — no wrapping 64-bit arithmetic ever
  reaches the distributed plan.

Graph500's optional vertex permutation is exposed as ``permute=True``:
a Feistel-style 2-round shuffle of the vertex id inside the same
Mersenne-31 hash family (again integer-only, bijective on [0, 2^scale)
via cycle-walking), so degree skew is not aligned with id order.

Multi-edges and self-loops are emitted raw, exactly as Graph500's edge
stream does; downstream consumers run the standard P1-P4 cleanup
(``operators/graph.py`` symmetrize / dedup / self-loop drop) — the same
contract as the text edge sources.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from parallel_louvain_method_spark.operators.dedup import _MERSENNE, _splitmix64

# Graph500 / RMAT quadrant probabilities and their integer thresholds in
# the hash range [0, 2^31-1): h < _T_A -> quadrant (0,0); < _T_AB ->
# (0,1); < _T_ABC -> (1,0); else (1,1).
_A, _B, _C = 0.57, 0.19, 0.19
_T_A = int(_A * _MERSENNE)
_T_AB = int((_A + _B) * _MERSENNE)
_T_ABC = int((_A + _B + _C) * _MERSENNE)


def _coeffs(seed: int, stream: int, n: int) -> list[tuple[int, int]]:
    """n pairwise-independent (a, b) pairs over Z_{2^31-1}, a != 0, from
    the SplitMix64 stream keyed by (seed, stream) — Python-side literals
    only."""
    out = []
    for i in range(n):
        base = (seed << 20) ^ (stream << 10) ^ i
        a = _splitmix64(2 * base) % (_MERSENNE - 1) + 1
        b = _splitmix64(2 * base + 1) % _MERSENNE
        out.append((a, b))
    return out


def _h31(x: Column, a: int, b: int) -> Column:
    """(a*x + b) mod 2^31-1 — x must already lie in [0, 2^31-1) so the
    product stays under 2^62 (ANSI-safe)."""
    return (F.lit(a) * x + F.lit(b)) % F.lit(_MERSENNE)


def kronecker_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    seed: int = 0,
    permute: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic RMAT edge stream: ``edgefactor * 2**scale`` edges
    over ``2**scale`` vertices as ``DataFrame[src: long, dst: long,
    weight: double]`` (unit weights, raw multiset — self-loops and
    multi-edges included, per the Graph500 stream contract).

    ``scale`` <= 40 keeps every hash input below 2^31-1 (edge ids enter
    the hash reduced mod 2^31-1 with a per-level offset, so no level sees
    a correlated input).  ``permute`` applies the bijective vertex
    shuffle described in the module docstring.
    """
    if not 1 <= scale <= 40:
        raise ValueError("kronecker_edges: scale must be in [1, 40]")
    if edgefactor < 1:
        raise ValueError("kronecker_edges: edgefactor must be >= 1")
    m = edgefactor << scale
    base = spark.range(0, m, numPartitions=num_partitions)
    eid = F.col("id")

    src: Column = F.lit(0).cast("long")
    dst: Column = F.lit(0).cast("long")
    level_coeffs = _coeffs(seed, stream=1, n=scale)
    # two independent hashes per level: the quadrant draw must not be a
    # deterministic function of the previous level's draw for the same
    # edge, so each level folds the edge id with its own (a, b) twice
    fold_coeffs = _coeffs(seed, stream=2, n=scale)
    for lvl in range(scale):
        a1, b1 = level_coeffs[lvl]
        a2, b2 = fold_coeffs[lvl]
        x = _h31(eid % F.lit(_MERSENNE), a2, b2)
        h = _h31(x, a1, b1)
        src_bit = (h >= F.lit(_T_AB)).cast("long")
        dst_bit = (
            ((h >= F.lit(_T_A)) & (h < F.lit(_T_AB)))
            | (h >= F.lit(_T_ABC))
        ).cast("long")
        shift = F.lit(1 << lvl).cast("long")
        src = src + src_bit * shift
        dst = dst + dst_bit * shift

    if permute:
        src = _permute_vertex(src, scale, seed)
        dst = _permute_vertex(dst, scale, seed)

    return base.select(
        src.alias("src"), dst.alias("dst"), F.lit(1.0).alias("weight")
    )


def _permute_vertex(v: Column, scale: int, seed: int) -> Column:
    """Bijection on [0, 2^scale): XOR-rotate-XOR with per-seed masks —
    each step is itself a bijection on the scale-bit space, composed
    twice.  Integer-only, replayable in SQL.

    steps: v ^= m1; v = rotl(v, r) within scale bits; v ^= m2.  The
    rotation is written overflow-free as ``(v mod 2^(scale-r)) * 2^r +
    v div 2^(scale-r)`` (never exceeds 2^scale <= 2^40), so the SQL
    replay needs no 128-bit arithmetic.
    """
    n_mask = (1 << scale) - 1
    m1 = _splitmix64((seed << 8) ^ 0xA5) & n_mask
    m2 = _splitmix64((seed << 8) ^ 0x5A) & n_mask
    r = (_splitmix64((seed << 8) ^ 0x3C) % max(scale - 1, 1)) + 1 if scale > 1 else 0
    v = v.bitwiseXOR(F.lit(m1))
    if r:
        lo = F.lit(1 << (scale - r)).cast("long")
        v = (v % lo) * F.lit(1 << r).cast("long") + F.floor(v / lo).cast(
            "long"
        )
    return v.bitwiseXOR(F.lit(m2))


def kronecker_oracle_sql(
    scale: int,
    edgefactor: int = 16,
    seed: int = 0,
    permute: bool = False,
) -> str:
    """The DuckDB replay of :func:`kronecker_edges` — the same integer
    algebra over ``generate_series``, built from the same Python-side
    coefficient stream.  Used by the driver gate; also a documentation
    artifact: the full generator semantics in ~20 lines of ANSI SQL."""
    m = edgefactor << scale
    level_coeffs = _coeffs(seed, stream=1, n=scale)
    fold_coeffs = _coeffs(seed, stream=2, n=scale)
    src_terms, dst_terms = [], []
    for lvl in range(scale):
        a1, b1 = level_coeffs[lvl]
        a2, b2 = fold_coeffs[lvl]
        h = (
            f"(({a1} * (({a2} * (eid % {_MERSENNE}) + {b2}) % {_MERSENNE})"
            f" + {b1}) % {_MERSENNE})"
        )
        src_terms.append(
            f"(CASE WHEN {h} >= {_T_AB} THEN {1 << lvl} ELSE 0 END)"
        )
        dst_terms.append(
            f"(CASE WHEN ({h} >= {_T_A} AND {h} < {_T_AB})"
            f" OR {h} >= {_T_ABC} THEN {1 << lvl} ELSE 0 END)"
        )
    src_expr = " + ".join(src_terms)
    dst_expr = " + ".join(dst_terms)
    if permute:
        n_mask = (1 << scale) - 1
        m1 = _splitmix64((seed << 8) ^ 0xA5) & n_mask
        m2 = _splitmix64((seed << 8) ^ 0x5A) & n_mask
        r = (
            (_splitmix64((seed << 8) ^ 0x3C) % max(scale - 1, 1)) + 1
            if scale > 1
            else 0
        )

        def perm(e: str) -> str:
            e = f"xor({e}, {m1})"
            if r:
                lo = 1 << (scale - r)
                e = f"((({e}) % {lo}) * {1 << r} + ({e}) // {lo})"
            return f"xor({e}, {m2})"

        src_expr, dst_expr = perm(f"({src_expr})"), perm(f"({dst_expr})")
    return f"""
        SELECT CAST({src_expr} AS BIGINT) AS src,
               CAST({dst_expr} AS BIGINT) AS dst,
               CAST(1.0 AS DOUBLE) AS weight
        FROM (SELECT CAST(g.i AS BIGINT) AS eid
              FROM generate_series(0, {m - 1}) g(i))
    """
