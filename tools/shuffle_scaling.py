"""One-box shuffle-machinery scaling ceiling — the sql-engine analog of
tools/kernel_scaling.py.

tools/kernel_scaling.py proved the barrier engine's numpy kernel scales at
~1.0 across processes, attributing its one-box residual to the shared
memory bus.  This tool does the same for the sql engine: it times a PURE
JVM shuffle join + aggregation — the exact shape of one sql-engine sweep
(dst-partitioned cached edges ⋈ shuffle_hash state → partial-agg exchange
→ per-src argmax), with NO Python worker anywhere — at two taskset-pinned
core counts.

If the engine's measured 4→16 scaling equals this ceiling, the residual
is the BOX (one shared memory bus + one shuffle substrate behind all
"executors"), not the engine's plan: on a real N vs 4N executor cluster
each executor brings its own memory channels, NVMe and NIC, which is the
resource this box cannot multiply.

Env: SHUFFLE_ROWS (87M), SHUFFLE_VERTS (6M), SCALING_LO (4),
SCALING_HI (16), PLM_LOCAL_DIR (forwarded).
Prints one JSON line and appends nothing — paste results into
BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import sys, time
sys.path.insert(0, {repo!r})
from parallel_louvain_method_spark import get_spark
from pyspark.sql import functions as F

cpus = {cpus}
spark = get_spark(app_name="shufscale", cores=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
edges = spark.range({rows}).select(
    F.pmod(F.xxhash64("id"), F.lit({verts})).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit({verts})).alias("dst"),
    F.lit(1.0).alias("weight"),
)
edges = edges.repartition(cpus, "dst").persist()
edges.count()  # cache build OUTSIDE the timed window (the engine's setup)
state = spark.range({verts}).select(
    F.col("id").alias("dst"),
    F.pmod(F.xxhash64("id", F.lit(2)), F.lit({verts})).alias("dst_comm"),
)
t0 = time.monotonic()
n = (
    edges.join(state.hint("shuffle_hash"), "dst")
    .groupBy("src", "dst_comm")
    .agg(F.sum("weight").alias("w"))
    .groupBy("src")
    .agg(F.max("w"))
    .count()
)
print("WALL", round(time.monotonic() - t0, 2), n)
spark.stop()
"""


def run(cpus: int, rows: int, verts: int) -> float:
    code = _JOB.format(repo=REPO, cpus=cpus, rows=rows, verts=verts)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        env=dict(os.environ),
    )
    for line in out.stdout.splitlines():
        if line.startswith("WALL"):
            return float(line.split()[1])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    rows = int(os.environ.get("SHUFFLE_ROWS", "87000000"))
    verts = int(os.environ.get("SHUFFLE_VERTS", "6000000"))
    lo = int(os.environ.get("SCALING_LO", "4"))
    hi = int(os.environ.get("SCALING_HI", "16"))
    with open("/proc/loadavg") as f:
        load_before = f.read().split()[:3]
    t_lo = run(lo, rows, verts)
    t_hi = run(hi, rows, verts)
    with open("/proc/loadavg") as f:
        load_after = f.read().split()[:3]
    print(
        json.dumps(
            {
                "rows": rows,
                "verts": verts,
                f"wall_{lo}": t_lo,
                f"wall_{hi}": t_hi,
                "shuffle_ceiling_eff": round((t_lo / t_hi) / (hi / lo), 3),
                "loadavg_before": load_before,
                "loadavg_after": load_after,
            }
        )
    )


if __name__ == "__main__":
    main()
