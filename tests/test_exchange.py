"""Unit tests for the in-stage star all-gather transport (Spark-free)."""
from __future__ import annotations

import threading

import numpy as np
import pytest

from parallel_louvain_method_spark.functions.exchange import StarAllGather


def _run_ranks(n, rounds_payloads):
    """Simulate n ranks in threads; rounds_payloads[r][rank] = bytes."""
    results = [[None] * len(rounds_payloads) for _ in range(n)]
    errors = []
    addr_box = {}
    addr_ready = threading.Event()

    def rank_fn(rank):
        try:
            g = StarAllGather(rank, n)
            if rank == 0:
                addr_box["addr"] = g.listen()
                addr_ready.set()
                if n > 1:
                    g.accept_all()
            else:
                addr_ready.wait(10)
                g.connect(addr_box["addr"])
            for r, payloads in enumerate(rounds_payloads):
                results[rank][r] = g.exchange(payloads[rank])
            g.close()
        except Exception as e:  # pragma: no cover
            errors.append((rank, e))

    threads = [threading.Thread(target=rank_fn, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not errors, errors
    return results


@pytest.mark.parametrize("n", [1, 2, 5])
def test_star_allgather_multiset_and_consistency(n):
    rng = np.random.default_rng(3)
    rounds = []
    for r in range(4):
        rounds.append(
            [
                bytes(rng.integers(0, 256, int(rng.integers(0, 50_000)), dtype=np.uint8))
                for _ in range(n)
            ]
        )
    # include an empty payload and a multi-MB payload
    rounds[1][0] = b""
    rounds[2][n - 1] = bytes(3_000_000)
    results = _run_ranks(n, rounds)
    for r in range(len(rounds)):
        want = sorted(rounds[r])
        for rank in range(n):
            got = results[rank][r]
            assert sorted(got) == want  # same multiset...
            assert got == results[0][r]  # ...and identical order everywhere
