"""Driver-grade paired bench runs with loadavg bracketing.

Runs `python bench.py` N times strictly back-to-back in the SAME harness
the driver uses (subprocess, same env), recording /proc/loadavg before and
after every run, and appends one JSON row per run to
BENCH/paired_r{round}.jsonl.  This is the evidence VERDICT r2 asked for to
adjudicate the driver-vs-repo measurement conflict: with loadavg attached
per run, a slow row with high ambient load is distinguishable from a plan
regression (which would reproduce at low load).

Usage: python BENCH/paired.py [n_runs] [tag]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def loadavg() -> list[float]:
    with open("/proc/loadavg") as fh:
        return [float(x) for x in fh.read().split()[:3]]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tag = sys.argv[2] if len(sys.argv) > 2 else "r3"
    out_path = os.path.join(REPO, "BENCH", f"paired_{tag}.jsonl")
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    for i in range(n):
        la0 = loadavg()
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        la1 = loadavg()
        parsed = None
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
        row = {
            "run": i,
            "tag": tag,
            "rc": proc.returncode,
            "wall": round(time.time() - t0, 1),
            "loadavg_before": la0,
            "loadavg_after": la1,
            "cpus": env["SPARK_GRAFT_CPUS"],
            "sf_dir": env["SPARK_GRAFT_SF_DIR"],
            "parsed": parsed,
        }
        with open(out_path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
        print(json.dumps({k: row[k] for k in ("run", "rc", "wall", "loadavg_before")}))


if __name__ == "__main__":
    main()
