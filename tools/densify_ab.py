"""Fresh-JVM densify A/B — the only valid way to compare string-id vs
long-id (R13 `Graph.densify()`) PageRank.

Round-2 lesson: an in-suite A/B (two PageRanks, two persisted graphs,
one JVM) is doubly invalid — the second leg runs against a JVM already
carrying the first leg's caches, and the leaked dense persists slowed
every later suite query (WCC +65%). This script runs each leg as its
own subprocess of bench.py (SPARK_GRAFT_ONLY=pagerank,
SPARK_GRAFT_DENSIFY=0 / 1), so each gets a cold JVM, identical conf,
and identical input, and writes both JSON lines plus the derived
comparison to BENCH/densify_ab.json.

Usage:
  python tools/densify_ab.py              # sf0.1, 32 cpus, expand 1
  SPARK_GRAFT_EXPAND=16 python tools/densify_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(densify: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_ONLY"] = "pagerank"
    env["SPARK_GRAFT_DENSIFY"] = "1" if densify else "0"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"leg densify={densify} failed:\n{proc.stderr[-2000:]}")
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    string_leg = run_leg(densify=False)
    dense_leg = run_leg(densify=True)
    s = string_leg["queries"]["pagerank_1e6"]
    d = dense_leg["queries"]["pagerank_1e6"]
    out = {
        "protocol": "two fresh JVMs, identical conf/input; "
        "SPARK_GRAFT_ONLY=pagerank legs of bench.py",
        "string_ids": string_leg,
        "dense_ids": dense_leg,
        "pagerank_string_sec": s,
        "pagerank_dense_sec": d,
        "dense_speedup_pct": round((s - d) / s * 100.0, 1),
        "note": "dense leg's graph_derivation includes the one-time "
        "encode (mapping build + two id joins)",
    }
    expand = string_leg.get("expand", 1)
    cpus = string_leg.get("cpus", 32)
    suffix = "" if (expand, cpus) == (1, 32) else f"_x{expand}_c{cpus}"
    path = os.path.join(REPO, "BENCH", f"densify_ab{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
