"""One-command reproduction of the three per-round artifacts.

    python jobs/run_all.py [--out DIR] [--skip-scaling]

runs, in order:

  1. correctness — the full pytest suite (which embeds the driver-gate
     replica tests/test_oracle_parity.py: every registered query vs its
     DuckDB oracle at sf0.01 with type-tagged value comparison) →
     DIR/correctness.txt (tail: pass/fail counts) + exit status.
  2. bench — `python bench.py` at $SPARK_GRAFT_SF_DIR (default sf0.1),
     local[$SPARK_GRAFT_CPUS] → DIR/bench.json (the one-line JSON the
     driver records as BENCH_r{N}.json).
  3. scaling — `python bench.py --scaling` (interleaved engine/JVM-control
     rounds at pinned N and 4N cores; the north rule's two-parallelism
     evidence) → writes BENCH/scaling_latest.md (BENCH/BASELINE.md is the
     curated multi-session doc, only created if absent) and copies the
     summary to DIR/scaling.txt. Skippable (--skip-scaling): ~20 min.

Exit code 0 iff every stage it ran succeeded. Artifacts land in --out
(default ./artifacts_run_all). No argument parsing beyond the two flags,
no hidden state: rerunning overwrites the same files.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], log_path: str, env=None) -> int:
    print(f"[run_all] {' '.join(cmd)} -> {log_path}", flush=True)
    with open(log_path, "w") as f:
        p = subprocess.run(cmd, cwd=REPO, stdout=f,
                           stderr=subprocess.STDOUT, env=env)
    with open(log_path) as f:
        tail = f.readlines()[-5:]
    for line in tail:
        print("  " + line.rstrip(), flush=True)
    return p.returncode


def main(argv: list[str]) -> int:
    out_dir = "artifacts_run_all"
    if "--out" in argv:
        out_dir = argv[argv.index("--out") + 1]
    os.makedirs(out_dir, exist_ok=True)
    env = dict(os.environ, PYTHONPATH=REPO)
    failures = []

    # Loudly record the registry size so a harness-truncated CORRECTNESS
    # artifact (fewer rows than registered queries) is visible at a glance.
    sys.path.insert(0, REPO)
    from avecado_spark import queries as _q
    n_q, n_o = len(_q.queries()), len(_q.oracle_sql())
    print(f"[run_all] registry: {n_q} queries, {n_o} with oracle SQL "
          f"({n_q - n_o} rows-only, ordered last)", flush=True)

    rc = _run([sys.executable, "-m", "pytest", "tests/", "-q",
               "--tb=line"], os.path.join(out_dir, "correctness.txt"),
              env=env)
    if rc != 0:
        failures.append("correctness")

    bench_log = os.path.join(out_dir, "bench_raw.txt")
    rc = _run([sys.executable, "bench.py"], bench_log, env=env)
    if rc != 0:
        failures.append("bench")
    else:
        # bench prints ONE json line (possibly after progress noise)
        with open(bench_log) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    with open(os.path.join(out_dir, "bench.json"), "w") as o:
                        o.write(line + "\n")
                    print("  bench.json: " +
                          json.dumps({k: v for k, v in
                                      json.loads(line).items()
                                      if k in ("value", "tiles_per_sec_z14",
                                               "knn_rescan_pct")}),
                          flush=True)

    if "--skip-scaling" not in argv:
        rc = _run([sys.executable, "bench.py", "--scaling"],
                  os.path.join(out_dir, "scaling.txt"), env=env)
        if rc != 0:
            failures.append("scaling")

    if failures:
        print(f"[run_all] FAILED stages: {', '.join(failures)}")
        return 1
    print("[run_all] all stages green")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
