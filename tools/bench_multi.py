"""Median-of-N bench artifact with run spread (VERDICT r13 ask 5).

Round 13's forensic problem: four single runs bracketed 460-514 s with
±2-3x per-query swings on IDENTICAL code, and separating code effects
from box noise took a section-17-sized effort. This tool fixes the
artifact convention: run bench.py N times (default 3), EACH IN A FRESH
PROCESS so every run keeps the cold-JVM semantics of all prior rounds'
single-run artifacts, then combine into one JSON carrying

- ``queries``: per-query MEDIAN seconds (the headline, robust to one
  bad leg),
- ``query_runs``: the full per-query series (so a future verdict can
  recompute any statistic without rerunning),
- ``run_totals_sec`` / ``value`` = median total,
- e2e cold/steady as medians with their per-run series alongside.

Usage: python tools/bench_multi.py [n_runs] [out.json]
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS pass through to bench.py.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    runs = []
    for i in range(n):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True, text=True, cwd=str(REPO),
        )
        line = proc.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        runs.append(rec)
        print(
            f"run {i + 1}/{n}: total {rec['value']}s, e2e cold "
            f"{rec['pipeline_e2e_rows_per_sec']} rows/s, steady "
            f"{rec['pipeline_e2e_steady_rows_per_sec']} rows/s "
            f"({time.time() - t0:.0f}s wall)",
            file=sys.stderr,
        )

    names = list(runs[0]["queries"].keys())
    series = {q: [r["queries"][q] for r in runs] for q in names}
    med_q = {q: round(statistics.median(series[q]), 3) for q in names}
    combined = {
        "metric": "suite_total_wall_sec",
        "value": round(statistics.median([r["value"] for r in runs]), 3),
        "unit": "sec",
        "queries": med_q,
        "sf": runs[0]["sf"],
        "runs": n,
        "convention": "median over N fresh-process runs; per-run series in query_runs",
        "run_totals_sec": [r["value"] for r in runs],
        "query_runs": series,
        "pipeline_e2e_rows": runs[0]["pipeline_e2e_rows"],
        "pipeline_e2e_rows_per_sec": round(
            statistics.median([r["pipeline_e2e_rows_per_sec"] for r in runs]), 1
        ),
        "pipeline_e2e_rows_per_sec_runs": [
            r["pipeline_e2e_rows_per_sec"] for r in runs
        ],
        "pipeline_e2e_steady_rows_per_sec": round(
            statistics.median(
                [r["pipeline_e2e_steady_rows_per_sec"] for r in runs]
            ),
            1,
        ),
        "pipeline_e2e_steady_rows_per_sec_runs": [
            r["pipeline_e2e_steady_rows_per_sec"] for r in runs
        ],
    }
    text = json.dumps(combined)
    if out_path:
        Path(out_path).write_text(text)
        print(f"wrote {out_path}", file=sys.stderr)
    print(text)


if __name__ == "__main__":
    main()
