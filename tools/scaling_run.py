"""Two-cluster-size scaling evidence (BASELINE.json north_rule: >=0.8
throughput scaling efficiency between N and 4N executors; sandbox stand-in
per driver instruction: same job at two local[] parallelism levels on the
same input).

Runs the heavy-mode bench in fresh subprocesses (new JVM each) at 2, 8 and
32 cores, then reports BOTH 4x pairs:
  - local[2] -> local[8]: all threads below the SMT knee — the clean
    measure of the ENGINE's scaling behavior;
  - local[8] -> local[32]: crosses into hyperthread territory on this
    16-physical-core box (raw CPU gives only ~3.6x of the nominal 4x, i.e.
    a ~0.9 hardware ceiling), reported alongside for transparency.

Steal robustness: this shared VM suffers intermittent EXTERNAL cpu steal
(CLAUDE.md) and one 25-minute pass gives it a wide window to corrupt one
leg. The level sequence therefore runs ``--rounds`` times (interleaved
2,8,32,2,8,32 — steal at any moment hits at most one leg of one round) and
each (query, level) takes the MIN across rounds of the in-run
per-query estimate (bench.py's headline is itself min-of-reps since
round 4): for a deterministic workload the min is the unbiased
estimator under additive contention noise.

Efficiency = (T_N / T_4N) / 4; results appended to BENCH.md.

Run:  python tools/scaling_run.py [sf_dir] [--rounds N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE = ["radius_join", "radius_topk", "tile_assign", "tile_rollup", "images_phash"]
LEVELS = [2, 8, 32]


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_HEAVY"] = "1"  # workload >> fixed job overhead
    env["SPARK_GRAFT_BENCH_REPS"] = "3"  # min-of-3 headline (noisy shared VM)
    # the per-run idle gate would stall every leg ~120 s: after a leg exits,
    # 1-min loadavg decays slowly from its OWN finished JVM (an average
    # artifact, not real contention). This runner's steal robustness is the
    # interleaved-rounds min estimator, so disable the gate per leg.
    env["SPARK_GRAFT_BENCH_IDLE_WAIT_S"] = "0"
    env.setdefault("SPARK_DRIVER_MEM", "16g")
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
    # tiny hand parser: '--rounds 2' consumes its VALUE token too, so the
    # value never leaks into the positional sf_dir slot
    pos: list[str] = []
    rounds = 1
    toks = sys.argv[1:]
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "--rounds" or t.startswith("--rounds="):
            if "=" in t:
                rounds = int(t.split("=", 1)[1])
            elif i + 1 < len(toks):
                rounds = int(toks[i + 1])
                i += 1
            else:
                sys.exit("usage: scaling_run.py [sf_dir] --rounds N")
        else:
            pos.append(t)
        i += 1
    sf_dir = pos[0] if pos else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )

    # interleave levels across rounds so a steal episode hits at most one
    # leg of one round; min across rounds per (query, level)
    per_round = []
    for _ in range(rounds):
        per_round.append({c: run_bench(c, sf_dir) for c in LEVELS})
    results = per_round[-1]  # rows_per_sec reporting uses the last round
    tmin = {
        c: {
            q: min(r[c]["queries"][q] for r in per_round
                   if q in r[c]["queries"])
            for q in HEADLINE
            if all(q in r[c]["queries"] for r in per_round)
        }
        for c in LEVELS
    }

    est = (f"min across {rounds} interleaved rounds of in-run median-of-3"
           if rounds > 1 else "in-run median-of-3, single round")
    lines = [
        "",
        f"## Scaling evidence (heavy-mode bench, same input: {sf_dir}; {est})",
        "",
        "N vs 4N cores per driver instruction; efficiency = (T_N / T_4N) / 4.",
        "local[2]->local[8] stays below the SMT knee (16 physical cores, 32",
        "hardware threads); local[8]->local[32] crosses it — raw CPU tops out",
        "at ~0.9 efficiency there (multiprocessing control measurement).",
        "",
        "| query | sec @2 | sec @8 | sec @32 | eff 2->8 | eff 8->32 |",
        "|---|---|---|---|---|---|",
    ]
    effs = {}
    for q in HEADLINE:
        t = {c: tmin[c].get(q) for c in LEVELS}
        if not all(t.values()):
            continue
        e28 = (t[2] / t[8]) / 4
        e832 = (t[8] / t[32]) / 4
        effs[q] = {"2->8": round(e28, 3), "8->32": round(e832, 3)}
        lines.append(
            f"| {q} | {t[2]:.2f} | {t[8]:.2f} | {t[32]:.2f} "
            f"| {e28:.2f} | {e832:.2f} |"
        )
    for c in LEVELS:
        lines.append(
            f"\nThroughput @{c} cores (last round): "
            + ", ".join(f"{k}={v}" for k, v in results[c]["rows_per_sec"].items())
        )
    lines.append("")
    report = "\n".join(lines)
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(report + "\n")
    print(report)
    print(json.dumps({"efficiencies": effs}))


if __name__ == "__main__":
    main()
