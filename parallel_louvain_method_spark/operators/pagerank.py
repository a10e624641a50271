"""PageRank over the canonical edge table (SURVEY.md A10, [NR] north rule).

Two engines, the same broadcast-vs-shuffle split as Louvain
(operators/louvain.py):

- **broadcast engine** (default while the DENSE vertex count fits driver /
  executor memory, ``broadcast_vertex_threshold``): ranks live as a numpy
  array broadcast per iteration; one ``mapInPandas`` pass over the cached
  dst-partitioned edge table returns each partition's EXACT per-dst
  contribution sums (dst-partitioning makes partials disjoint), collected
  as ~16 B/vertex.  One Spark job per iteration, no joins, no per-iteration
  broadcast-exchange collects;
- **DataFrame engine** (sparse ids or past the threshold): pure DataFrame
  loop — one shuffle join (ranks onto edges by src) + one aggregation per
  iteration, rank table localCheckpoint'ed each round (iterative-lineage
  rule).  Nothing per-vertex lands on one machine: the 10^9-vertex path.

Scale notes:
- the edge table is persisted once, partitioned by the relevant key, so
  only the (tiny) rank state moves per iteration;
- dangling mass (vertices with no out-edges) is redistributed uniformly —
  on a symmetrized graph danglings are only isolated vertices, but the
  operator also accepts directed input;
- convergence check ``max|Δ|`` is driver-side numpy on the broadcast
  engine; one extra small aggregation per iteration on the DataFrame
  engine; pass ``tol=None`` to run exactly ``max_iter`` rounds (needed
  for fixed-k SQL-oracle comparison);
- ``reset`` (a ``DataFrame[vtx, p]`` teleport distribution) turns either
  engine into personalized PageRank; the classic path keeps its exact
  original expression shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from parallel_louvain_method_spark.operators.graph import vertex_ids
from parallel_louvain_method_spark.plans.lineage import fresh_checkpoint


def _pagerank_barrier(
    edges: DataFrame,
    n: int,
    damping: float,
    max_iter: int,
    tol: float | None,
    weighted: bool,
    p=None,
) -> DataFrame | None:
    """Whole-run barrier engine: ALL iterations inside ONE Spark stage.

    The broadcast engine's measured per-iteration bound is not the kernel
    (bincount A/B parity) but Spark re-reading the cached edge table and
    re-serializing it JVM→Arrow→Python EVERY iteration — the same finding
    that motivated the Louvain barrier engine, re-applied here.  Each
    dst-partitioned slice crosses the boundary ONCE (zstd-packed blob);
    per-iteration traffic is the task's own per-dst partial sums
    (disjoint under dst-partitioning, ~12 B per touched dst) over the
    raw-TCP star exchange (functions/exchange.py), with the coordinator
    ``allGather`` as handshake and fallback.  Every task applies the same
    gathered partials to its full rank vector, so all tasks hold
    identical state and take identical tol-exit decisions — the Louvain
    barrier invariant.

    Returns None when barrier scheduling is unavailable (dynamic
    allocation, no slots) — the caller falls back to the per-iteration
    broadcast engine.  Values match the broadcast engine's to within
    summation-order ulps (both engines' per-dst sums are bincounts over
    partition rows; the gate's 8-decimal rounding and the cross-engine
    parity tests bound the difference).
    """
    import numpy as np

    from parallel_louvain_method_spark.operators.louvain import (
        _barrier_supported,
    )

    spark = edges.sparkSession
    sc = spark.sparkContext
    if not _barrier_supported(sc):
        return None
    n_parts = min(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        sc.defaultParallelism,
    )
    wcol = F.col("weight").cast("double") if weighted else F.lit(1.0)
    ep = (
        edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
            wcol.alias("weight"),
        )
        .repartition(n_parts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ep.count()

    # out-weight per src (iteration-invariant): one JVM aggregation over
    # the cache, broadcast once — identical to the broadcast engine's
    ow_pdf = ep.groupBy("src").agg(F.sum("weight").alias("w")).toPandas()
    out_w = np.zeros(n, dtype=np.float64)
    out_w[ow_pdf["src"].to_numpy(dtype=np.int64)] = ow_pdf["w"].to_numpy()
    dangling_mask = out_w == 0.0
    has_danglings = bool(dangling_mask.any())
    safe_out = np.where(dangling_mask, 1.0, out_w)
    ow_bc = sc.broadcast(safe_out)
    dm_bc = sc.broadcast(dangling_mask)
    p_bc = sc.broadcast(p) if p is not None else None

    def _pack(batches):
        import pickle

        import numpy as _np
        import pyarrow as _pa

        ss, dd, ww = [], [], []
        for b in batches:
            ss.append(b.column(0).to_numpy(zero_copy_only=False))
            dd.append(b.column(1).to_numpy(zero_copy_only=False))
            ww.append(b.column(2).to_numpy(zero_copy_only=False))
        s = _np.concatenate(ss) if ss else _np.empty(0, _np.int32)
        d = _np.concatenate(dd) if dd else _np.empty(0, _np.int32)
        w = _np.concatenate(ww) if ww else _np.empty(0, _np.float64)
        raw = pickle.dumps((s, d, w), protocol=4)
        comp = _pa.Codec("zstd", compression_level=1).compress(
            raw, asbytes=True
        )
        yield _pa.RecordBatch.from_pydict(
            {"raw_len": [len(raw)], "blob": [comp]}
        )

    blobs = ep.mapInArrow(_pack, schema="raw_len long, blob binary")

    nv = int(n)
    d_ = float(damping)
    mi_ = int(max_iter)
    tol_ = tol
    np_ = int(n_parts)
    has_d_ = has_danglings

    def _run(rows):
        import base64
        import pickle

        import numpy as _np
        from pyspark import BarrierTaskContext

        from parallel_louvain_method_spark.functions.exchange import (
            StarAllGather,
        )

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        blob = None
        raw_len = 0
        for r in rows:
            blob = r["blob"]
            raw_len = r["raw_len"]
        if blob is not None:
            import pyarrow as _pa

            s, dcol, w = pickle.loads(
                _pa.Codec("zstd").decompress(
                    bytes(blob), int(raw_len), asbytes=True
                )
            )
        else:
            s = _np.empty(0, _np.int32)
            dcol = _np.empty(0, _np.int32)
            w = _np.empty(0, _np.float64)
        s64 = s.astype(_np.int64)
        d64 = dcol.astype(_np.int64)
        ow = ow_bc.value
        dmask = dm_bc.value
        pv = p_bc.value if p_bc is not None else None

        xg = StarAllGather(pid, np_)
        hub_addr = None
        if pid == 0 and np_ > 1:
            try:
                hub_addr = xg.listen()
            except OSError:
                hub_addr = None
        use_sockets = np_ == 1
        if np_ > 1:
            for g in ctx.allGather(
                base64.b64encode(pickle.dumps(hub_addr, protocol=4)).decode(
                    "ascii"
                )
            ):
                ga = pickle.loads(base64.b64decode(g))
                if ga is not None:
                    hub_addr = ga
            try:
                if hub_addr is None:
                    raise ConnectionError("no hub advertised")
                if pid == 0:
                    xg.accept_all()
                else:
                    xg.connect(tuple(hub_addr))
                st = "ok"
            except Exception as e:
                st = f"fail: {e!r}"
            use_sockets = all(x == "ok" for x in ctx.allGather(st))
            if not use_sockets:
                xg.close()

        if pv is None:
            ranks = _np.full(nv, 1.0 / nv, dtype=_np.float64)
            base = (1.0 - d_) / nv
        else:
            ranks = pv.copy()
            base = (1.0 - d_) * pv
        try:
            for _it in range(mi_):
                if len(s64):
                    contrib = w / ow[s64] * ranks[s64]
                    part = _np.bincount(
                        d64, weights=contrib, minlength=nv
                    )
                    dv = _np.flatnonzero(part)
                else:
                    part = None
                    dv = _np.empty(0, _np.int64)
                payload = pickle.dumps(
                    (
                        dv.astype(_np.int32),
                        part[dv] if part is not None else
                        _np.empty(0, _np.float64),
                    ),
                    protocol=4,
                )
                if use_sockets:
                    frames = xg.exchange(payload)
                else:
                    frames = [
                        base64.b64decode(g)
                        for g in ctx.allGather(
                            base64.b64encode(payload).decode("ascii")
                        )
                    ]
                in_sum = _np.zeros(nv, dtype=_np.float64)
                for fr in frames:
                    gv, gs = pickle.loads(fr)
                    if len(gv):
                        # dst-partitioned: partials are disjoint scatters
                        in_sum[gv.astype(_np.int64)] = gs
                dangling = (
                    float(ranks[dmask].sum()) if has_d_ else 0.0
                )
                if pv is None:
                    new_ranks = base + d_ * in_sum + d_ * dangling / nv
                else:
                    new_ranks = base + d_ * in_sum + d_ * dangling * pv
                delta = float(_np.abs(new_ranks - ranks).max())
                ranks = new_ranks
                # identical state everywhere -> identical exit decision
                if tol_ is not None and delta < tol_:
                    break
        finally:
            xg.close()
        # strided slice: tasks hold identical ranks, driver reassembles
        yield (pid, pickle.dumps(ranks[pid::np_], protocol=4))

    results = blobs.rdd.barrier().mapPartitions(_run).collect()
    import pickle as _pickle

    ranks_arr = np.empty(nv, dtype=np.float64)
    for pid, rblob in results:
        ranks_arr[pid::np_] = _pickle.loads(bytes(rblob))
    ow_bc.destroy()
    dm_bc.destroy()
    if p_bc is not None:
        p_bc.destroy()
    ep.unpersist()
    import pandas as pd

    return (
        spark.createDataFrame(
            pd.DataFrame(
                {"vtx": np.arange(nv, dtype=np.int64), "rank": ranks_arr}
            ),
            schema="vtx long, rank double",
        )
        .localCheckpoint(eager=True)
    )


def _pagerank_broadcast(
    edges: DataFrame,
    n: int,
    damping: float,
    max_iter: int,
    tol: float | None,
    weighted: bool,
    p=None,
) -> DataFrame:
    """Broadcast-state engine: dense ids 0..n-1 required (caller checks).

    ``p`` (numpy float64[n], Σ=1) is the teleport distribution for
    personalized PageRank; None means uniform (classic)."""
    import numpy as np

    spark = edges.sparkSession
    sc = spark.sparkContext
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    wcol = F.col("weight").cast("double") if weighted else F.lit(1.0)
    ep = (
        edges.select(
            F.col("src").cast("int").alias("src"),
            F.col("dst").cast("int").alias("dst"),
            wcol.alias("weight"),
        )
        .repartition(n_parts, "dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ep.count()

    # out-weight per src, once, as a broadcast array (0 for danglings)
    ow_pdf = (
        ep.groupBy("src").agg(F.sum("weight").alias("w")).toPandas()
    )
    out_w = np.zeros(n, dtype=np.float64)
    out_w[ow_pdf["src"].to_numpy(dtype=np.int64)] = ow_pdf["w"].to_numpy()
    dangling_mask = out_w == 0.0
    has_danglings = bool(dangling_mask.any())
    # guard against division for danglings (they contribute via mass term)
    safe_out = np.where(dangling_mask, 1.0, out_w)

    if p is None:
        ranks = np.full(n, 1.0 / n, dtype=np.float64)
        base = (1.0 - damping) / n  # scalar: classic uniform teleport
    else:
        ranks = p.copy()
        base = (1.0 - damping) * p  # vector: personalized teleport
    ow_bc = sc.broadcast(safe_out)

    nv = int(n)
    for _ in range(max_iter):
        state_bc = sc.broadcast(ranks)

        def contribs(batches, _r=state_bc, _ow=ow_bc, _n=nv):
            # mapInArrow + a dense bincount accumulator: the pandas Series
            # wrapper was measured at ~2x the raw Arrow->numpy cost (the
            # louvain barrier-pack finding), and the old per-batch
            # np.unique + union1d merge was O(rows log rows) per batch —
            # the dense accumulator is one O(rows) scatter-add per batch
            # with the SAME summation tree (bincount accumulates in row
            # order within a batch; acc += part adds batch partials in the
            # same sequence), so the sums are bit-identical.  Per-task
            # memory is one float64[n] — the same O(n) budget the ranks
            # broadcast already spends.
            import numpy as _np
            import pyarrow as _pa

            r = _r.value
            ow = _ow.value
            acc = _np.zeros(_n, dtype=_np.float64)
            seen = _np.zeros(_n, dtype=bool)
            for b in batches:
                s = b.column(0).to_numpy(zero_copy_only=False)
                d = b.column(1).to_numpy(zero_copy_only=False)
                w = b.column(2).to_numpy(zero_copy_only=False)
                contrib = w / ow[s] * r[s]
                # dst-partitioned: this partition owns every row of its dsts
                acc += _np.bincount(d, weights=contrib, minlength=_n)
                seen[d] = True
            dv = _np.flatnonzero(seen)
            yield _pa.RecordBatch.from_pydict(
                {"vtx": dv.astype("int64"), "in_sum": acc[dv]}
            )

        pdf = ep.mapInArrow(contribs, schema="vtx long, in_sum double").toPandas()
        state_bc.destroy()
        in_sum = np.zeros(n, dtype=np.float64)
        in_sum[pdf["vtx"].to_numpy()] = pdf["in_sum"].to_numpy()
        dangling = float(ranks[dangling_mask].sum()) if has_danglings else 0.0
        if p is None:
            new_ranks = base + damping * in_sum + damping * dangling / n
        else:
            new_ranks = base + damping * in_sum + damping * dangling * p
        delta = float(np.abs(new_ranks - ranks).max())
        ranks = new_ranks
        if tol is not None and delta < tol:
            break

    ow_bc.destroy()
    ep.unpersist()
    import pandas as pd

    return (
        spark.createDataFrame(
            pd.DataFrame({"vtx": np.arange(n, dtype=np.int64), "rank": ranks}),
            schema="vtx long, rank double",
        )
        .localCheckpoint(eager=True)
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = 1e-6,
    weighted: bool = True,
    broadcast_vertex_threshold: int = 5_000_000,
    reset: DataFrame | None = None,
) -> DataFrame:
    """Returns ``DataFrame[vtx: long, rank: double]``; Σ rank = 1.

    ``edges`` is interpreted as DIRECTED (src -> dst).  For the undirected
    semantics of the link graph, pass the symmetric table.

    ``reset`` turns this into PERSONALIZED PageRank: a
    ``DataFrame[vtx: long, p: double]`` teleport distribution (Σ p = 1;
    vertices absent from it get p = 0 — rank flows to them only through
    edges).  Both the (1-d) base term and the dangling-mass
    redistribution use p instead of 1/n, and iteration starts from p, so
    uniform p reproduces the classic operator.  The table is joined once
    onto the vertex set (broadcast below the threshold) — a seed set of
    any size up to |V| works; None keeps the classic uniform teleport on
    the exact original expression shapes.

    While the vertex set is below ``broadcast_vertex_threshold`` the rank
    table gets an explicit broadcast hint in the per-iteration join:
    ``localCheckpoint`` erases its statistics, so the planner would
    otherwise assume it is huge and sort-merge-join — re-sorting the big
    cached edge side EVERY iteration.  Past the threshold the hint is
    withheld and the pre-partitioned edge cache carries the join.
    """
    verts = vertex_ids(edges).withColumnRenamed("v", "vtx").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank", F.lit(0.0))

    # broadcast engine while ids are dense and state fits memory (same
    # decision as louvain's engine selection)
    if n <= broadcast_vertex_threshold:
        # dense gate needs BOTH bounds: {-1, 0, 1, 3} has n == max+1 but a
        # negative id would silently wrap numpy indexing in the broadcast
        # engine — require min >= 0, else use the DataFrame engine
        mx, mn = verts.agg(F.max("vtx"), F.min("vtx")).first()
        if mx is not None and int(mx) == n - 1 and int(mn) >= 0:
            p_vec = None
            if reset is not None:
                import numpy as np

                rp = reset.select("vtx", "p").toPandas()
                vs = rp["vtx"].to_numpy(dtype=np.int64)
                # validate before indexing: a negative id would WRAP
                # numpy indexing (silently teleporting to vertex n-1),
                # and a duplicate would overwrite instead of summing —
                # both corrupt the distribution without an error
                if len(vs) and (vs.min() < 0 or vs.max() >= n):
                    raise ValueError(
                        f"reset contains vertex ids outside 0..{n - 1}"
                    )
                if len(np.unique(vs)) != len(vs):
                    raise ValueError("reset contains duplicate vertex ids")
                p_vec = np.zeros(n, dtype=np.float64)
                p_vec[vs] = rp["p"].to_numpy(dtype=np.float64)
            verts.unpersist()
            # whole-run barrier stage while the cluster can schedule one
            # (edges cross the Python boundary once, not once per
            # iteration); per-iteration broadcast engine otherwise
            res = _pagerank_barrier(
                edges, n, damping, max_iter, tol, weighted, p=p_vec
            )
            if res is not None:
                return res
            return _pagerank_broadcast(
                edges, n, damping, max_iter, tol, weighted, p=p_vec
            )

    hint = (lambda df: F.broadcast(df)) if n <= broadcast_vertex_threshold else (lambda df: df)

    wcol = F.col("weight") if weighted else F.lit(1.0)
    out_w = edges.groupBy(F.col("src").alias("vtx")).agg(
        F.sum(wcol).alias("out_w")
    )
    # transition fraction per edge: w / out_w(src); pre-partitioned by the
    # per-iteration join key so the cached big side never re-shuffles
    n_parts = int(
        edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    trans = (
        edges.join(hint(out_w.withColumnRenamed("vtx", "src")), "src")
        .select("src", "dst", (wcol / F.col("out_w")).alias("frac"))
        .repartition(n_parts, "src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    trans.count()

    verts_p: DataFrame | None = None
    if reset is not None:
        # a reset row naming a vertex that is not in the graph would be
        # silently dropped by the join below, leaking its teleport mass
        # (Σ rank < 1 forever); duplicates would duplicate output rows
        bad = reset.join(verts, "vtx", "left_anti").count()
        if bad:
            raise ValueError(
                f"reset names {bad} vertex ids not present in the graph"
            )
        if reset.groupBy("vtx").count().filter("count > 1").count():
            raise ValueError("reset contains duplicate vertex ids")
        verts_p = (
            verts.join(hint(reset.select("vtx", "p")), "vtx", "left")
            .na.fill({"p": 0.0})
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        verts_p.count()
        ranks = fresh_checkpoint(verts_p.select("vtx", F.col("p").alias("rank")))
    else:
        ranks = fresh_checkpoint(
            verts.select("vtx", F.lit(1.0 / n).alias("rank"))
        )
    base = (1.0 - damping) / n
    # dangling set is static — skip the per-iteration aggregation entirely
    # when it's empty (always true for symmetrized graphs)
    danglings = verts.join(out_w, "vtx", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    has_danglings = danglings.count() > 0

    for _ in range(max_iter):
        contrib = (
            trans.join(hint(ranks.withColumnRenamed("vtx", "src")), "src")
            .groupBy(F.col("dst").alias("vtx"))
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("in_sum"))
        )
        # dangling mass: rank held by vertices with no out-edges
        dangling = (
            (
                ranks.join(danglings.select("vtx"), "vtx")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
            if has_danglings
            else 0.0
        )
        # per-iteration scalars ride as DATA (1-row broadcast), not
        # literals: a literal lands in the whole-stage-codegen source, so
        # a per-iteration value (the dangling redistribute) would compile
        # a fresh janino class every iteration — fresh classes run
        # interpreted until the JIT catches up, measured as random
        # multi-second per-sweep stalls in the louvain sql loop (same
        # fix there, operators/louvain.py _sql_sweep_loop)
        if reset is None:
            redistribute = damping * dangling / n
            params = edges.sparkSession.createDataFrame(
                [(float(redistribute),)], "redistribute double"
            )
            new_ranks = verts.join(hint(contrib), "vtx", "left").na.fill(
                {"in_sum": 0.0}
            ).crossJoin(F.broadcast(params)).select(
                "vtx",
                (
                    F.lit(base)
                    + F.lit(damping) * F.col("in_sum")
                    + F.col("redistribute")
                ).alias("rank"),
            )
        else:
            # personalized: both teleport and dangling mass land on p(v)
            params = edges.sparkSession.createDataFrame(
                [(float(damping * dangling),)], "dmass double"
            )
            new_ranks = verts_p.join(hint(contrib), "vtx", "left").na.fill(
                {"in_sum": 0.0}
            ).crossJoin(F.broadcast(params)).select(
                "vtx",
                (
                    F.lit(1.0 - damping) * F.col("p")
                    + F.lit(damping) * F.col("in_sum")
                    + F.col("dmass") * F.col("p")
                ).alias("rank"),
            )
        # truncate lineage every iteration (iterative-lineage rule); the
        # broadcast exchange of `contrib` forces a materialization per
        # iteration regardless, so deferring the checkpoint only re-runs
        # the previous join inside the next one (measured slower)
        new_ranks = fresh_checkpoint(new_ranks)
        if tol is not None:
            delta = (
                new_ranks.withColumnRenamed("rank", "new_rank")
                .join(ranks, "vtx")
                .agg(F.max(F.abs(F.col("new_rank") - F.col("rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks

    trans.unpersist()
    verts.unpersist()
    danglings.unpersist()
    if verts_p is not None:
        verts_p.unpersist()
    return ranks
