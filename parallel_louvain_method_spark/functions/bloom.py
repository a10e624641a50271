"""Bloom-filter semi-join prefilter (training-pipeline / scale operator).

At 100 TB the cheapest join is the one whose probe side never reaches the
shuffle: when the build side is small-ish (a keep-list of repos, a dedup
survivor set, a curated id set) but too hot to broadcast as a hash relation,
a Bloom filter compresses it to ``m_bits`` bits (≤ ceil(m/63) word rows)
that ride to every task as a tiny broadcast hash relation and drop the vast
majority of probe rows before any exchange.  Spark's own runtime row-level
bloom
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) is opaque and
plan-dependent; this operator is the EXPLICIT, deterministic variant — same
bits on every engine, so the DuckDB gate twin reproduces the exact kept set
INCLUDING false positives.

Hash family: the house universal family over Mersenne-31 (same construction
as the MinHash permutations, operators/dedup.py:150) — probe ``i`` sets bit
``(((key mod M31) * a_i + b_i) mod M31) mod m_bits``.  All arithmetic stays
in non-overflowing int64 (``(M31-1)^2 + b < 2^62``) so Spark longs and
DuckDB BIGINTs agree bit-for-bit; no Python runs per row anywhere.

False positives are inherent (rate ≈ (1 - e^{-kn/m})^k); false negatives are
impossible.  Callers needing exactness follow with the real join on the
(now tiny) survivor set — the classic two-phase semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M31 = (1 << 31) - 1
_WORD = 63  # bits per word: DuckDB raises on BIGINT 1<<63, so the sign bit
# is never used — words stay non-negative and agree across engines


def _splitmix64(i: int) -> int:
    # same public-domain finalizer as operators/dedup.py:39 — duplicated
    # 5-liner rather than imported so functions/ keeps its one-way
    # dependency rule (operators/ imports functions/, never the reverse)
    u64 = (1 << 64) - 1
    z = (i * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9) & u64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & u64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & u64
    return z ^ (z >> 31)


def bloom_probe_constants(probes: int, seed: int = 9001) -> list[tuple[int, int]]:
    """The fixed (a_i, b_i) coefficients, exposed so the DuckDB oracle
    embeds the SAME constants as the Spark pipeline (house pattern,
    operators/dedup.py minhash_permutation_constants)."""
    return [
        (
            _splitmix64(2 * (seed + i)) % (_M31 - 1) + 1,
            _splitmix64(2 * (seed + i) + 1) % _M31,
        )
        for i in range(probes)
    ]


def _position(key: F.Column, a: int, b: int, m_bits: int) -> F.Column:
    return F.pmod(
        F.pmod(F.pmod(key, F.lit(_M31)) * F.lit(a) + F.lit(b), F.lit(_M31)),
        F.lit(m_bits),
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    probes: int = 4,
    seed: int = 9001,
) -> DataFrame:
    """Aggregate the build side into the filter's 63-bit words.

    Returns ``(word_idx: long, word: long)`` with only non-zero words
    present — at most ``ceil(m_bits / 63)`` rows regardless of build-side size,
    produced by one map-side-combining groupBy (the build side is scanned
    exactly once, never collected)."""
    key = F.col(key_col).cast("long")
    pos = F.explode(
        F.array(
            *[
                _position(key, a, b, m_bits)
                for a, b in bloom_probe_constants(probes, seed)
            ]
        )
    ).alias("pos")
    bits = keys.select(pos).distinct()
    return bits.groupBy(
        (F.col("pos") / _WORD).cast("long").alias("word_idx")
    ).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(pos % 63 as int))")).alias("word")
    )


def bloom_semi_join(
    probe: DataFrame,
    key_col: str,
    build_keys: DataFrame,
    build_key_col: str,
    m_bits: int = 4096,
    probes: int = 4,
    seed: int = 9001,
) -> DataFrame:
    """Keep probe rows whose key MAY be in the build set (no false
    negatives, deterministic false positives).

    Plan shape: build side → ≤ ceil(m_bits/63) word rows (materialized once,
    scanned by every probe join) → ``probes`` broadcast HASH joins on the
    word index, each followed by a codegen bit test — the probe side streams
    through in place with ZERO shuffle, and each output row carries one
    extra long, never the filter itself.  (A first cut broadcast the whole
    word ARRAY via crossJoin; the nested-loop join materialized the m/63
    longs into every probe output row — m_bits/8 bytes PER ROW of pure copy
    bandwidth, measured 5x slower than the whole filter at 1.3M probe rows.
    An absent word index simply drops the row at the inner join: no word
    row ⇒ no bits set ⇒ reject, exactly the bloom semantics.)"""
    words = bloom_build(
        build_keys, build_key_col, m_bits, probes, seed
    ).localCheckpoint(eager=True)  # ≤ ceil(m_bits/63) rows, scanned k times
    out = probe
    key = F.col(key_col).cast("long")
    # SQL shiftleft accepts a column shift amount (the Python wrapper does
    # not), so the bit test rides one expr per probe; `&` is bitwise AND on
    # longs in both Spark SQL and DuckDB, and the 63-bit word size keeps the
    # sign bit clear so the engines agree without unsigned-shift gymnastics.
    for i, (a, b) in enumerate(bloom_probe_constants(probes, seed)):
        out = out.withColumn(f"__bpos_{i}", _position(key, a, b, m_bits))
        w_i = words.select(
            F.col("word_idx").alias(f"__bw_idx_{i}"),
            F.col("word").alias(f"__bw_word_{i}"),
        )
        out = (
            out.withColumn(
                f"__bw_idx_{i}", F.expr(f"cast(__bpos_{i} / 63 as long)")
            )
            .join(F.broadcast(w_i), f"__bw_idx_{i}")
            .filter(
                F.expr(
                    f"(__bw_word_{i} & shiftleft(1L, "
                    f"cast(__bpos_{i} % 63 as int))) != 0"
                )
            )
        )
    return out.drop(
        *[c for i in range(probes) for c in
          (f"__bpos_{i}", f"__bw_idx_{i}", f"__bw_word_{i}")]
    )


def bloom_oracle_sql(
    build_sql: str,
    probe_sql: str,
    key_col: str,
    m_bits: int = 4096,
    probes: int = 4,
    seed: int = 9001,
) -> str:
    """DuckDB twin of :func:`bloom_semi_join` — same constants, same
    Mersenne-31 positions, same word layout, so the kept set matches
    bit-for-bit including false positives.  ``build_sql`` must yield one
    column ``k``; ``probe_sql`` yields the probe rows with ``key_col``.
    Keys must be non-negative for cross-engine parity: Spark's ``pmod``
    and DuckDB's signed ``%`` agree only there."""
    consts = bloom_probe_constants(probes, seed)
    pos_union = "\n            UNION ALL ".join(
        f"SELECT (((k % {_M31}) * {a} + {b}) % {_M31}) % {m_bits} AS pos "
        f"FROM bkeys"
        for a, b in consts
    )
    probe_conds = " AND ".join(
        "EXISTS (SELECT 1 FROM words w WHERE w.word_idx = "
        f"((((p.{key_col} % {_M31}) * {a} + {b}) % {_M31}) % {m_bits}) // 63 "
        "AND (w.word & (CAST(1 AS BIGINT) << CAST("
        f"((((p.{key_col} % {_M31}) * {a} + {b}) % {_M31}) % {m_bits}) % 63 "
        "AS INTEGER))) != 0)"
        for a, b in consts
    )
    return f"""
        WITH bkeys AS ({build_sql}),
        pos AS (SELECT DISTINCT pos FROM ({pos_union})),
        words AS (
            SELECT pos // 63 AS word_idx,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER))
                       AS word
            FROM pos GROUP BY 1
        )
        SELECT p.* FROM ({probe_sql}) p
        WHERE {probe_conds}
    """
