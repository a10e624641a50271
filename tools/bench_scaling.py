"""Scaling-efficiency evidence (BASELINE.json metric / north rule).

The north rule demands ≥0.8 throughput scaling efficiency between N and 4N
executors.  This sandbox has one machine, so the sanctioned proxy (task
instructions) is the same job at two parallelism levels: local[8] vs
local[32] on the SAME input.

Efficiency definition (throughput basis):
    eff = (T_8 / T_32) / (32 / 8)
i.e. perfect 4x speedup -> 1.0; no speedup -> 0.25.

Runs bench.py twice via subprocess (fresh JVM each, honest cold-ish runs)
and writes BENCH_SCALING_RUN.md (the raw latest run) + prints a JSON
summary line.  The curated cross-engine analysis lives in
BENCH_SCALING.md and is maintained by hand from these runs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    # scaling runs are single-shot per parallelism level (best-of-N would
    # double an already-long low-core run); SCALING_ENGINE forces a
    # specific Louvain superstep engine (e.g. `sql` — the >20M-vertex path
    # whose scaling the north rule needs evidenced separately)
    env.setdefault("SPARK_GRAFT_REPEAT", "1")
    if os.environ.get("SCALING_ENGINE"):
        env["SPARK_GRAFT_LOUVAIN_ENGINE"] = os.environ["SCALING_ENGINE"]
    # pin the WHOLE process tree (JVM + Python workers) to `cpus` physical
    # cores — local[N] alone only caps Spark task threads, and the pandas
    # kernels would otherwise borrow the idle cores, inflating the low-N
    # throughput and corrupting the scaling measurement
    cmd = [
        "taskset",
        "-c",
        f"0-{cpus - 1}",
        sys.executable,
        os.path.join(REPO, "bench.py"),
    ]
    out = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=5400
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = int(os.environ.get("SCALING_LO", "8"))
    hi = int(os.environ.get("SCALING_HI", "32"))
    r_lo = run(lo, sf_dir)
    r_hi = run(hi, sf_dir)

    rows = []
    effs = {}
    for name in r_lo["queries"]:
        t_lo = r_lo["queries"][name]
        t_hi = r_hi["queries"].get(name)
        if not t_hi:
            continue
        eff = (t_lo / t_hi) / (hi / lo)
        effs[name] = round(eff, 3)
        rows.append((name, t_lo, t_hi, eff))

    # headline: the Louvain metric
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff_louvain = (t_lo / t_hi) / (hi / lo)
    tp_lo = r_lo["louvain"]["edges_per_sec"]
    tp_hi = r_hi["louvain"]["edges_per_sec"]
    eff_throughput = (tp_hi / tp_lo) / (hi / lo) if tp_lo else 0.0

    md = [
        "# BENCH_SCALING_RUN — latest raw scaling run (see BENCH_SCALING.md"
        " for the curated cross-engine analysis)",
        "",
        "Sandbox proxy for N vs 4N executors (task instructions): the same",
        f"job on the same input (`{sf_dir}`) at `local[{lo}]` vs `local[{hi}]`.",
        "",
        "Efficiency = (T_N / T_4N) / 4 on wall time; = (TP_4N / TP_N) / 4 on",
        "throughput.  Target (north rule): >= 0.8.",
        "",
        f"| metric | local[{lo}] | local[{hi}] | scaling efficiency |",
        "|---|---|---|---|",
        f"| Louvain wall (s) | {t_lo} | {t_hi} | {eff_louvain:.3f} |",
        f"| Louvain edges/sec | {tp_lo} | {tp_hi} | {eff_throughput:.3f} |",
    ]
    for name, a, b, eff in rows:
        md.append(f"| {name} (s) | {a} | {b} | {eff:.3f} |")
    md += [
        "",
        f"Raw local[{lo}]: `{json.dumps(r_lo)}`",
        "",
        f"Raw local[{hi}]: `{json.dumps(r_hi)}`",
        "",
    ]
    with open(os.path.join(REPO, "BENCH_SCALING_RUN.md"), "w") as f:
        f.write("\n".join(md))
    print(
        json.dumps(
            {
                "louvain_eff_wall": round(eff_louvain, 3),
                "louvain_eff_throughput": round(eff_throughput, 3),
                "per_query_eff": effs,
            }
        )
    )


if __name__ == "__main__":
    main()
