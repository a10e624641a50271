"""Pure-Python XXH64 + word-n-gram twins of the Spark-side expressions.

Purpose: the MinHash/SimHash pipelines hash shingles with Spark's
``xxhash64`` (seed 42), which DuckDB cannot evaluate — the one
non-SQL-expressible step in either pipeline.  The correctness gate
therefore materializes the ``(doc_id, h)`` hash intermediates to parquet
and runs the rest of the algebra (signatures → bands/chunks → verify) in
DuckDB over them.  These functions compute that intermediate WITHOUT a
SparkSession, so ``oracle_sql()`` can write the artifact itself and stay
independent of query/oracle execution order.

XXH64 here is the canonical public algorithm (Yann Collet, BSD) as
implemented by Spark's ``org.apache.spark.sql.catalyst.expressions.XXH64``
over little-endian UTF-8 bytes with Spark's fixed seed 42.  Parity with
the JVM implementation is pinned by tests/test_pipeline_ops.py
(test_python_xxh64_matches_spark) — if a Spark upgrade ever changed the
hash, the gate would fail loudly, not silently drift.
"""

from __future__ import annotations

import re

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42  # functions.xxhash64's fixed seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data`` — returned as a SIGNED 64-bit int, matching the
    value Spark's ``xxhash64(col)`` produces for a string column."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def word_ngrams(text: str | None, n: int) -> list[str]:
    """Twin of operators/dedup._word_ngrams: distinct space-joined word
    n-grams of ``lower(trim(text))`` split on ``\\s+`` (ASCII whitespace,
    matching Java's default regex class)."""
    if text is None:
        return []
    # Spark's F.trim strips SPACES only (0x20) — Python str.strip() with
    # no argument strips all whitespace and would silently diverge on
    # tab/newline-padded text (extra empty boundary tokens on the Spark
    # side), so mirror the exact Java semantics
    words = re.split(r"\s+", text.strip(" ").lower(), flags=re.ASCII)
    if n == 1:
        return list(dict.fromkeys(words))
    if len(words) < n:
        return []
    return list(
        dict.fromkeys(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        )
    )


def hashed_shingles(
    text: str | None, shingle_n: int, mod: int | None = None
) -> list[int]:
    """Per-doc hash list: ``xxhash64(shingle)`` per distinct word n-gram,
    optionally reduced mod ``mod`` (the MinHash pipeline's Mersenne
    modulus; ``None`` keeps the raw signed hash, the SimHash input)."""
    out = []
    for sh in word_ngrams(text, shingle_n):
        h = xxh64(sh.encode("utf-8"))
        out.append(h % mod if mod is not None else h)
    return out
