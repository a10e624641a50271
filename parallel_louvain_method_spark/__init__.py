"""parallel_louvain_method_spark — a from-scratch PySpark-native link-graph
analytics engine with the capabilities of nmandrus1/Parallel-Louvain-Method.

The reference (read-only at /root/reference) is a C++17/MPI Louvain engine
over CSR-packed weighted undirected graphs.  This package re-expresses its
semantics Spark-first:

- the central table is an edge DataFrame ``(src: long, dst: long,
  weight: double)`` (reference ``struct Edge``, src/graph.h:15-18);
- ghost/halo exchanges become shuffle joins against an assignment table;
- the Louvain inner sweep is a vectorized numpy kernel run per partition
  block via ``applyInPandas`` (reference src/community.cpp:64-102);
- PageRank / connected components / label propagation / triangle counting
  run over the same edge table as DataFrame loops.

Public surface::

    from parallel_louvain_method_spark import session, graph, louvain, algos

Nothing here imports Spark at module-import time except where needed, so the
pure-numpy kernels stay testable without a JVM.
"""

__version__ = "0.1.0"

from parallel_louvain_method_spark.session import get_spark  # noqa: F401
