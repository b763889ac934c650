"""Two-parallelism scaling evidence (BASELINE.json north_rule: >=0.8
throughput scaling efficiency between N and 4N executors; sandbox stand-in
per driver instruction: same job at local[8] vs local[32] on the same
input).

Runs bench.py in fresh subprocesses (new JVM each, no warm-cache sharing),
computes per-query throughput at both parallelism levels and the scaling
efficiency  eff = (T_8 / T_32) / 4  (1.0 == perfect linear), and appends a
report to BENCH.md.

Run:  python tools/scaling_run.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE = ["radius_join", "tile_assign", "tile_rollup", "images_phash", "knn_rings"]


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_HEAVY"] = "1"  # workload >> fixed job overhead
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo, hi = 8, 32
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)

    lines = [
        "",
        f"## Scaling evidence: local[{lo}] vs local[{hi}] (same input: {sf_dir})",
        "",
        "Stand-in for N vs 4N executors per driver instruction. Efficiency =",
        f"(T_{lo} / T_{hi}) / {hi // lo}; 1.0 = perfect linear scaling.",
        "",
        "| query | sec @8 | sec @32 | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    effs = []
    for q in HEADLINE:
        t_lo, t_hi = r_lo["queries"].get(q), r_hi["queries"].get(q)
        if not t_lo or not t_hi:
            continue
        sp = t_lo / t_hi
        eff = sp / (hi / lo)
        effs.append((q, eff))
        lines.append(f"| {q} | {t_lo:.2f} | {t_hi:.2f} | {sp:.2f}x | {eff:.2f} |")
    lines += [
        "",
        f"Throughput @{hi} cores: "
        + ", ".join(f"{k}={v}" for k, v in r_hi["rows_per_sec"].items()),
        f"Throughput @{lo} cores: "
        + ", ".join(f"{k}={v}" for k, v in r_lo["rows_per_sec"].items()),
        "",
    ]
    report = "\n".join(lines)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(report + "\n")
    print(report)
    print(json.dumps({"efficiencies": dict(effs)}))


if __name__ == "__main__":
    main()
