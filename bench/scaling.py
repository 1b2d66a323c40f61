"""Scaling-efficiency evidence: the identical rollup job at two
parallelism levels (local[8] vs local[32]) on identical input.

The north_rule's two-cluster-size criterion (N vs 4N executors,
efficiency >= 0.8) cannot use a real cluster in this sandbox; per the
driver instruction it is evidenced by running the same job at two core
counts and reporting throughput at both plus the scaling efficiency.

Each level runs in a fresh subprocess (own JVM) via jobs/run_pipeline.py
with a fixed shuffle-partition count (128) so the plan is identical and
only executor parallelism changes. Efficiency:

    eff = (throughput_32 / throughput_8) / (32 / 8)

Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_URLS = int(os.environ.get("SPARK_GRAFT_SCALE_URLS", "6000"))
N_SLOTS = int(os.environ.get("SPARK_GRAFT_SCALE_SLOTS", str(48 * 30)))
LEVELS = [8, 32]


def run_level(cores: int) -> dict:
    wh = tempfile.mkdtemp(prefix=f"scale{cores}_")
    env = dict(os.environ)
    env["SPARK_GRAFT_SHUFFLE"] = "128"
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "jobs", "run_pipeline.py"),
            "--master", f"local[{cores}]",
            "--warehouse", os.path.join(wh, "wh"),
            "--synth-urls", str(N_URLS),
            "--synth-slots", str(N_SLOTS),
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    rows = N_URLS * N_SLOTS
    results = {}
    for cores in LEVELS:
        r = run_level(cores)
        # throughput over the whole job (ingest scan + 3 tiers + codec)
        total = r["ingest_sec"] + r["rollup_sec"]
        results[cores] = {
            "total_sec": round(total, 2),
            "rollup_sec": r["rollup_sec"],
            "rows_per_sec": round(rows / total, 1),
            "compression_ratio": r["metrics"].get("blocks_30m", {}).get(
                "compression_ratio"
            ),
        }
        print(f"# local[{cores}]: {results[cores]}", file=sys.stderr)

    n, n4 = LEVELS
    speedup_total = results[n]["total_sec"] / results[n4]["total_sec"]
    speedup_rollup = results[n]["rollup_sec"] / results[n4]["rollup_sec"]
    eff_total = speedup_total / (n4 / n)
    eff_rollup = speedup_rollup / (n4 / n)
    summary = {
        "rows": rows,
        "levels": results,
        "rollup_speedup": round(speedup_rollup, 3),
        "rollup_scaling_efficiency": round(eff_rollup, 3),
        "total_speedup": round(speedup_total, 3),
        "total_scaling_efficiency": round(eff_total, 3),
        "target": 0.8,
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as fh:
        fh.write(
            "# BENCH — scaling-efficiency evidence (N vs 4N)\n\n"
            "Same rollup+codec job (jobs/run_pipeline.py), identical input\n"
            f"({N_URLS} series x {N_SLOTS} half-hour slots = {rows:,} rows,\n"
            "5% gaps), identical plan (128 shuffle partitions), two\n"
            "parallelism levels — the in-sandbox stand-in for N vs 4N\n"
            "executors per the driver instruction. `rollup sec` is the\n"
            "north-metric phase (3-tier cascade + Gorilla encode over the\n"
            "landed table); `total` additionally includes the one-off\n"
            "synthesis + ingest write of the raw table.\n\n"
            "| level | total sec | rollup sec | rollup rows/sec | Gorilla ratio |\n"
            "|---|---|---|---|---|\n"
            + "\n".join(
                f"| local[{c}] | {r['total_sec']} | {r['rollup_sec']} | "
                f"{round(rows / r['rollup_sec']):,} | {round(r['compression_ratio'], 4)} |"
                for c, r in results.items()
            )
            + f"\n\nRollup-phase speedup local[{n}] -> local[{n4}]: "
            f"**{speedup_rollup:.2f}x** (ideal {n4 // n}x) -> scaling "
            f"efficiency **{eff_rollup:.3f}** (target >= 0.8)\n"
            f"Whole-job speedup: {speedup_total:.2f}x -> efficiency "
            f"{eff_total:.3f}\n"
        )


if __name__ == "__main__":
    main()
