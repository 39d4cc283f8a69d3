"""Hardware capability probe for the scaling analysis in BASELINE.md.

Measures how process-parallel CPU work actually scales on this host,
independent of Spark/JVM effects: N worker processes each execute the same
fixed CPU burn; perfect scaling keeps wall-time flat as N grows.  Prints
one JSON line with wall-times and the 8→32 efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time


def _burn(_: int) -> int:
    h = 0
    for i in range(40_000_000):
        h = (h * 31 + i) % 1000003
    return h


def main() -> None:
    out = {"loadavg": os.getloadavg()[0]}
    walls = {}
    for n in (1, 8, 16, 32):
        t0 = time.time()
        with mp.Pool(n) as p:
            p.map(_burn, range(n))
        walls[n] = round(time.time() - t0, 2)
    out["wall_sec_by_procs"] = walls
    # efficiency of 8 -> 32 procs: (work32/wall32) / (work8/wall8) / 4
    out["eff_8_to_32"] = round((32 / walls[32]) / (8 / walls[8]) / 4, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
