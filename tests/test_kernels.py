"""Spark-free golden tests for the numpy kernels (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pytest

from parallel_louvain_method_spark.functions import kernels
from tests.conftest import (
    CSR5_EDGES,
    EPS,
    GOLDEN16_EDGES,
    GOLDEN16_N_COMMUNITIES,
    GOLDEN16_Q_FINAL,
    GOLDEN16_Q_INITIAL,
)


def _arrays(edges):
    e = np.array(edges)
    return e[:, 0], e[:, 1], np.ones(len(e))


def test_csr5_layout_matches_reference():
    # golden arrays from /root/reference/tests/main_test.cpp:23-30
    csr = kernels.pack_csr(*_arrays(CSR5_EDGES))
    assert csr.row_index.tolist() == [0, 2, 5, 8, 9, 10]
    assert csr.column_index.tolist() == [1, 2, 0, 2, 3, 0, 1, 4, 1, 2]
    assert csr.weights.tolist() == [1.0] * 10
    assert csr.ecount == 5


def test_golden16_sequential_louvain():
    csr = kernels.pack_csr(*_arrays(GOLDEN16_EDGES))
    assert csr.ecount == 28  # tests/main_test.cpp:64
    deg = kernels.weighted_degrees(csr)
    m2 = 2.0 * csr.ecount
    q0 = kernels.modularity(np.zeros(16), deg, m2)
    assert q0 == pytest.approx(GOLDEN16_Q_INITIAL, abs=EPS)
    comm, in_w, tot, qs, improved = kernels.louvain_sequential(csr)
    assert improved
    assert qs[-1] == pytest.approx(GOLDEN16_Q_FINAL, abs=EPS)
    assert len(set(comm.tolist())) == GOLDEN16_N_COMMUNITIES


def test_symmetrize_dedup_set_semantics():
    # exact duplicate collapses; parallel edge with different weight survives
    src = np.array([0, 0, 0])
    dst = np.array([1, 1, 1])
    w = np.array([1.0, 1.0, 2.0])
    s, d, ww = kernels.symmetrize_dedup_edges(src, dst, w)
    assert len(s) == 4  # (0,1,1) (0,1,2) (1,0,1) (1,0,2)
    # self-loop symmetrizes onto itself -> single entry
    s, d, ww = kernels.symmetrize_dedup_edges(
        np.array([2]), np.array([2]), np.array([3.0])
    )
    assert len(s) == 1


def test_self_loop_degree_counts_once():
    # src/graph.cpp:238-247: weighted_degree sums the CSR row; the deduped
    # self-loop contributes once
    csr = kernels.pack_csr(np.array([0, 0]), np.array([0, 1]), np.array([2.0, 1.0]))
    deg = kernels.weighted_degrees(csr)
    assert deg[0] == pytest.approx(3.0)
    assert deg[1] == pytest.approx(1.0)


def test_modularity_bounds_property():
    rng = np.random.default_rng(42)
    for _ in range(5):
        n = 30
        m = 80
        src = rng.integers(0, n, m)
        dst = rng.integers(0, n, m)
        w = np.ones(m)
        keep = src != dst
        csr = kernels.pack_csr(src[keep], dst[keep], w[keep])
        comm, in_w, tot, qs, _ = kernels.louvain_sequential(csr)
        assert all(-0.5 - 1e-9 <= q <= 1.0 + 1e-9 for q in qs)
        # modularity non-decreasing across sweeps (greedy local moves)
        assert all(qs[i + 1] >= qs[i] - 1e-9 for i in range(len(qs) - 1))
