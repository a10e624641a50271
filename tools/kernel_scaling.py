"""Kernel-only scaling microbench — isolates COMPUTE from Spark transport.

The barrier Louvain engine's per-sweep work is `louvain_block_local_dense`
over one src-partition's adjacency.  This benchmark runs exactly that
kernel over the same total row count split across N independent OS
processes (multiprocessing, no Spark, no shared JVM), which measures the
hardware's compute-scaling ceiling for the sweep stage:

    python tools/kernel_scaling.py            # 1 / 8 / 32 processes

Interpretation: if this reports ~1.0 efficiency 8->32 while the end-to-end
bench reports less, the residual is the transport/shuffle layer sharing
one box's memory bus and disks (local-mode proxy artifact), not the
algorithm — on a real N vs 4N executor cluster each executor brings its
own memory bandwidth and spill disks.
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init():
    import sys as _sys

    _sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

N_GLOBAL = 1_200_000  # vertices (matches REPOS=40000 file graph)
TOTAL_ROWS = 34_800_000  # symmetric edge rows at that size


def work(args):
    seed, rows, n_global = args
    import numpy as np

    from parallel_louvain_method_spark.functions import kernels

    rng = np.random.default_rng(seed)
    n_local = 37_500
    srcs = rng.choice(n_global, n_local, replace=False)
    s = np.repeat(srcs, max(1, rows // n_local)).astype(np.int32)
    d = rng.integers(0, n_global, len(s)).astype(np.int32)
    w = np.ones(len(s), dtype=np.float32)
    comm = np.arange(n_global, dtype=np.int64)
    deg = np.ones(n_global)
    tot = np.ones(n_global)
    t = time.monotonic()
    kernels.louvain_block_local_dense(
        s, d, w, comm, deg, tot, 2.0 * len(s), 0.0, max_inner=6, seed=0
    )
    return time.monotonic() - t


def main() -> None:
    walls = {}
    for nproc in (1, 8, 32):
        rows = TOTAL_ROWS // nproc
        with Pool(nproc, initializer=_init) as p:
            t0 = time.monotonic()
            p.map(work, [(i, rows, N_GLOBAL) for i in range(nproc)])
            walls[nproc] = round(time.monotonic() - t0, 2)
        print(f"{nproc} procs x {rows} rows: wall={walls[nproc]}s", file=sys.stderr)
    eff = round((walls[8] / walls[32]) / 4, 3)
    print(json.dumps({"walls_sec": walls, "kernel_eff_8_to_32": eff}))


if __name__ == "__main__":
    main()
