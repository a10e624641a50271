"""Plan-quality tests: pushdown, pruning, broadcast, codegen (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parallel_louvain_method_spark.plans.explain import (
    assert_column_pruned,
    broadcast_join_count,
    pushed_filters,
    read_schemas,
    wholestage_codegen_spans,
)

SF_DIR = "/root/testdata/sf0.01"


def test_filter_pushdown_to_parquet(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_quantity") > 30)
        .select("l_orderkey", "l_partkey")
    )
    pf = pushed_filters(df)
    assert any("l_quantity" in p for p in pf), pf


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    schemas = read_schemas(df)
    assert schemas and all(
        "l_orderkey" in s and "l_comment" not in s and "l_extendedprice" not in s
        for s in schemas
    ), schemas


def test_content_pruned_after_hashing(spark):
    """The corpus rule: nothing downstream of sha2() may rescan content."""
    from parallel_louvain_method_spark.sources.corpus import shared_content_edges

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("source"), F.col("text").alias("content")
    )
    # edges derive from the hash only; 'text' must not survive into the agg
    edges, _ = shared_content_edges(docs, node_col="source")
    # scan reads (source, text) but the post-hash plan projects text away
    # before the join: assert the join inputs don't carry it
    from parallel_louvain_method_spark.plans.explain import plan_text
    plan = plan_text(edges)
    assert "content#" not in plan.split("Exchange")[-1]


def test_small_dim_join_broadcasts(spark):
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    assert broadcast_join_count(joined) >= 1


def test_builtin_expressions_stay_in_codegen(spark):
    from parallel_louvain_method_spark.operators.text import token_counts

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = token_counts(docs)
    assert wholestage_codegen_spans(df) >= 1
    # no BatchEvalPython (row-at-a-time UDF) anywhere in the text operators
    plan = wholestage_codegen_spans.__globals__["plan_text"](df)
    assert "BatchEvalPython" not in plan


def test_fresh_checkpoint_stats_stay_bounded(spark):
    """Regression for the r3 sql-engine hang: ``localCheckpoint`` preserves
    originStats, and an iterated self-join SQUARES the carried sizeInBytes
    BigInt each round (digits double: measured 988 → 1976 → 3951 → 7901 by
    round 10 on Spark 4.1.2) until the driver lives inside Toom-Cook
    BigInteger multiplies in SizeInBytesOnlyStatsPlanVisitor.visitJoin.
    ``fresh_checkpoint`` must keep the digit count flat and bounded."""
    from parallel_louvain_method_spark.plans.lineage import (
        fresh_checkpoint,
        size_in_bytes_digits,
    )

    df = spark.range(200).select(
        F.col("id").alias("vtx"), F.col("id").alias("comm")
    )
    df = fresh_checkpoint(df)
    digits = []
    for _ in range(8):
        j = df.select(F.col("vtx").alias("comm"), F.col("comm").alias("jc"))
        nxt = (
            df.hint("shuffle_hash")
            .join(j.hint("shuffle_hash"), "comm", "left")
            .select("vtx", F.coalesce("jc", "comm").alias("comm"))
        )
        df = fresh_checkpoint(nxt)
        digits.append(size_in_bytes_digits(df))
    # the buggy pattern reaches ~250 digits by round 8; a stats-free leaf
    # stays at the constant default (19-20 digits for Long.MaxValue)
    assert max(digits) <= 40, digits
    assert df.count() == 200


def test_plain_local_checkpoint_compounds_stats(spark):
    """Documents WHY fresh_checkpoint exists: the plain localCheckpoint
    variant of the loop above really does compound stats multiplicatively
    (this is Spark behavior, not ours — if an upgrade fixes it, this test
    tells us the workaround can be retired)."""
    from parallel_louvain_method_spark.plans.lineage import size_in_bytes_digits

    df = spark.range(200).select(
        F.col("id").alias("vtx"), F.col("id").alias("comm")
    )
    df = df.localCheckpoint(eager=True)
    for _ in range(4):
        j = df.select(F.col("vtx").alias("comm"), F.col("comm").alias("jc"))
        df = (
            df.hint("shuffle_hash")
            .join(j.hint("shuffle_hash"), "comm", "left")
            .select("vtx", F.coalesce("jc", "comm").alias("comm"))
            .localCheckpoint(eager=True)
        )
    assert size_in_bytes_digits(df) > 40


def test_new_graph_ops_stay_jvm_side(spark, golden16_df):
    """A16-A20 (metrics / truss / walks) are pure DataFrame algebra: no
    row-at-a-time Python anywhere in their plans, and the 1-row vol(G)
    total rides the partition-quality plan as a broadcast."""
    from parallel_louvain_method_spark.operators.metrics import (
        degree_assortativity,
        partition_quality,
    )
    from parallel_louvain_method_spark.operators.truss import edge_support
    from parallel_louvain_method_spark.operators.walks import random_walks

    plan_text = wholestage_codegen_spans.__globals__["plan_text"]
    assign = golden16_df.select(
        F.col("src").alias("vtx"), (F.col("src") % 4).alias("community")
    ).distinct()
    from parallel_louvain_method_spark.operators.metrics import (
        closeness_centrality,
    )
    from parallel_louvain_method_spark.operators.spectral import (
        eigenvector_centrality,
        hits,
    )

    pq = partition_quality(golden16_df, assign)
    for df in (
        degree_assortativity(golden16_df),
        pq,
        edge_support(golden16_df),
        random_walks(golden16_df, walk_length=2),
        eigenvector_centrality(golden16_df, max_iter=2, tol=None),
        hits(golden16_df, max_iter=2, tol=None),
        closeness_centrality(golden16_df, 2, method="hll"),
    ):
        assert "BatchEvalPython" not in plan_text(df)
        assert "ArrowEvalPython" not in plan_text(df)
    # the 1-row vol(G) total rides as a broadcast (nested-loop cross
    # build, not a hash join, so check the plan text directly)
    assert "BroadcastNestedLoopJoin" in plan_text(pq)


def test_incremental_edges_plan_quality(spark):
    """The incremental merge must never drag `content` past the hash and
    never fall into row-Python: postings carry (node, sha256) only."""
    from parallel_louvain_method_spark.sources.corpus import (
        incremental_shared_content_edges,
        shared_content_edges,
        shared_content_postings,
        synth_corpus,
    )
    from parallel_louvain_method_spark.plans.explain import plan_text

    corpus = synth_corpus(spark, n_repos=20)
    old = corpus.filter(F.pmod(F.xxhash64("repo", "commit"), F.lit(3)) != 0)
    batch = corpus.filter(F.pmod(F.xxhash64("repo", "commit"), F.lit(3)) == 0)
    edges, _, _ = incremental_shared_content_edges(
        shared_content_postings(old),
        shared_content_edges(old)[0],
        batch,
    )
    text = plan_text(edges)
    assert "BatchEvalPython" not in text
    # content never appears as a join/aggregate attribute — only inside
    # the sha2 projection (localCheckpointed inputs hide upstream scans;
    # assert on the live plan's attributes)
    assert "sha2" not in text.split("Exchange")[-1]


def test_bloom_semi_join_plan_quality(spark):
    """Probe side of the bloom prefilter must see only broadcast joins —
    zero hash-partitioning Exchange anywhere in the filter plan."""
    from parallel_louvain_method_spark.functions.bloom import bloom_semi_join
    from parallel_louvain_method_spark.plans.explain import (
        broadcast_join_count,
        plan_text,
        shuffle_exchange_count,
    )

    probe = spark.range(10_000).select(F.col("id").alias("key"))
    build = spark.range(100).select(F.col("id").alias("k"))
    kept = bloom_semi_join(probe, "key", build, "k", m_bits=1024, probes=3)
    text = plan_text(kept)
    assert shuffle_exchange_count(kept) == 0, text
    # formatted mode prints each operator in the tree AND the detail
    # section, so count detail headers: one per probe
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", text)) == 3, text
    assert "BatchEvalPython" not in text
