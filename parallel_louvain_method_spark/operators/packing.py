"""Sequence packing — the concat-and-chunk step between curation and
training: documents are concatenated in a deterministic order and cut
into fixed token-budget sequences, each document mapped to the sequence
slots it spans (split across boundaries, as GPT-style pre-training
packers do).

Why this shape and not bin-packing: first-fit bin packing is inherently
sequential (bin state depends on every prior doc), while concat-and-chunk
is pure prefix-sum algebra — a window cumulative sum — so it runs as one
shuffle per shard with no iteration, and it is what large pre-training
pipelines actually ship (no padding waste; documents split at sequence
boundaries carry their remainder into the next sequence).

Scale design:

- Documents are first routed to ``n_shards`` independent packing shards
  by a deterministic hash of ``doc_id`` (``pmod(xxhash64(...))``) — the
  whole operator is then per-shard parallel: a 100 TB corpus packs as
  100k independent shard streams, each a bounded window.  The window
  function partitions by shard, so no global ordering bottleneck exists;
  the per-shard cumsum is the only shuffle.
- Within a shard the order is ``doc_id`` (total, deterministic), making
  the output bit-reproducible across runs, engines, and cluster sizes —
  the property the DuckDB gate checks.
- A document of ``t`` tokens starting at running offset ``s`` occupies
  sequences ``floor(s / budget) .. floor((s + t - 1) / budget)``; the
  span explodes via ``sequence()`` — all codegen, no Python.
- Zero-token documents are dropped explicitly (they occupy no slot);
  documents longer than ``budget`` simply span multiple sequences (no
  special case).

Output grain: one row per (document, sequence) incidence, with the
half-open token interval of the document that lands in that sequence —
exactly what a downstream tokenizer-writer needs to materialize shards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from parallel_louvain_method_spark.operators.dedup import (
    _MERSENNE,
    _splitmix64,
)


def _shard_coeffs(seed: int) -> tuple[int, int]:
    """(a, b) over Z_{2^31-1} from the SplitMix64 stream — the same
    engine-portable hash family as the MinHash permutations and the RMAT
    source, so the DuckDB gate replays the shard routing bit-exactly
    (DuckDB has no xxhash64)."""
    a = _splitmix64(2 * (seed ^ 0x9AC4)) % (_MERSENNE - 1) + 1
    b = _splitmix64(2 * (seed ^ 0x9AC4) + 1) % _MERSENNE
    return a, b


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 1,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """``DataFrame[shard, seq_id, doc_id, doc_from, doc_to, seq_from]``:

    - ``shard``      packing shard (hash of ``doc_id`` mod ``n_shards``)
    - ``seq_id``     sequence index within the shard (0-based)
    - ``doc_from``/``doc_to``  half-open token range of THIS document
      that lands in this sequence (``doc_to - doc_from`` tokens)
    - ``seq_from``   offset inside the sequence where that slice starts

    ``tokens_col`` names a precomputed token-count column; when omitted
    the whitespace token count of ``text_col`` is used (cheap and
    deterministic — swap in ``operators/text.token_counts`` output for a
    BPE-ish count).
    """
    if budget < 1:
        raise ValueError("pack_sequences: budget must be >= 1")
    if n_shards < 1:
        raise ValueError("pack_sequences: n_shards must be >= 1")
    toks = (
        F.col(tokens_col)
        if tokens_col
        else F.size(F.split(F.trim(text_col), r"\s+"))
    )
    a, b = _shard_coeffs(seed)
    shard = (
        (F.lit(a) * (F.col(id_col) % F.lit(_MERSENNE)) + F.lit(b))
        % F.lit(_MERSENNE)
        % F.lit(n_shards)
    ).cast("int")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        toks.cast("long").alias("t"),
    ).filter(F.col("t") > 0)

    w = Window.partitionBy("shard").orderBy("doc_id")
    offs = base.select(
        "doc_id",
        "shard",
        "t",
        (F.sum("t").over(w) - F.col("t")).alias("s"),
    )
    b = F.lit(budget).cast("long")
    first_seq = F.floor(F.col("s") / b)
    last_seq = F.floor((F.col("s") + F.col("t") - 1) / b)
    out = offs.select(
        "doc_id",
        "shard",
        "s",
        "t",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * b
    doc_from = F.greatest(seq_start - F.col("s"), F.lit(0).cast("long"))
    doc_to = F.least(seq_start + b - F.col("s"), F.col("t"))
    return out.select(
        "shard",
        F.col("seq_id").cast("long").alias("seq_id"),
        "doc_id",
        doc_from.alias("doc_from"),
        doc_to.alias("doc_to"),
        F.greatest(F.col("s") - seq_start, F.lit(0).cast("long")).alias(
            "seq_from"
        ),
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One row per shard: sequence count, token fill, and fill ratio —
    the packer's efficiency report.  With concat-and-chunk every
    sequence except each shard's last is exactly full, so ``fill_ratio``
    is a lower-bounded sanity metric, not a tuning knob."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum(F.col("doc_to") - F.col("doc_from")).alias("fill")
    )
    return per_seq.groupBy("shard").agg(
        F.count("*").alias("n_sequences"),
        F.sum("fill").alias("tokens"),
        (F.sum("fill") / (F.count("*") * F.lit(float(budget)))).alias(
            "fill_ratio"
        ),
    )
