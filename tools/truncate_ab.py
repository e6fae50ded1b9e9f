"""A/B the lineage-cut cadence (PregelRunner.truncate_every) against
the round-4 profiled floor: the 0.51 s/step lazy-localCheckpoint
plan->RDD conversion is the only engine-owned term left in the scaling
model, and cutting every K supersteps pays it 1/K as often — at the
price of re-planning and re-executing the uncut window inside each
in-window action.

Protocol (BENCH/BASELINE.md min-wall hygiene): one FRESH JVM per leg
via tools/floor_profile.py (floor-bound venue: sf0.1, expand=1,
8 cores, dense ids), `repeats` legs per configuration run round-robin,
host-steal recorded per leg, per-config result = the least-stolen
(minimum step_mean) leg. Writes BENCH/truncate_ab.json and prints it.

Usage: python tools/truncate_ab.py [repeats=2] [sf_dir] [expand]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    {"name": "lazy_k1", "env": {"SPARK_GRAFT_STATE_MODE": "lazy", "SPARK_GRAFT_TRUNCATE_EVERY": "1"}},
    {"name": "lazy_k2", "env": {"SPARK_GRAFT_STATE_MODE": "lazy", "SPARK_GRAFT_TRUNCATE_EVERY": "2"}},
    {"name": "lazy_k4", "env": {"SPARK_GRAFT_STATE_MODE": "lazy", "SPARK_GRAFT_TRUNCATE_EVERY": "4"}},
    # cache mode's per-step cost grows with step index (exponentially-
    # nested analyzed plan once prior caches drop) — cap its window so
    # the leg terminates; the recorded per_step curve IS the result
    {"name": "cache", "env": {"SPARK_GRAFT_STATE_MODE": "cache", "SPARK_GRAFT_TRUNCATE_EVERY": "1", "SPARK_GRAFT_PROFILE_MAX_STEPS": "7"}},
]


def _read_steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0, sum(vals))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    expand = sys.argv[3] if len(sys.argv) > 3 else "1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    legs: dict[str, list[dict]] = {c["name"]: [] for c in CONFIGS}
    # round-robin so host-noise windows spread across configs, not
    # across one config's whole sample
    for r in range(repeats):
        for cfg in CONFIGS:
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, **cfg["env"])
            s0, t0 = _read_steal()
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "tools", "floor_profile.py"),
                 sf_dir, expand],
                env=env, capture_output=True, text=True,
            )
            s1, t1 = _read_steal()
            if proc.returncode != 0:
                print(f"{cfg['name']} rep {r} FAILED:\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
            rec = json.loads(line)
            rec["steal_pct_capacity"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
            legs[cfg["name"]].append(rec)
            print(json.dumps({
                "config": cfg["name"], "rep": r,
                "step_mean_sec": rec["step_mean_sec"],
                "phase_mean_sec": rec["phase_mean_sec"],
                "steal_pct_capacity": rec["steal_pct_capacity"],
            }), file=sys.stderr, flush=True)

    out = {
        "venue": {"sf_dir": sf_dir, "expand": int(expand), "cpus": int(cpus),
                  "densified": True, "protocol":
                  f"min step_mean over {repeats} fresh-JVM legs per config, "
                  "round-robin order, floor_profile.py steady window"},
        "configs": {},
    }
    for name, recs in legs.items():
        if not recs:
            out["configs"][name] = {"error": "all legs failed"}
            continue
        best = min(recs, key=lambda x: x["step_mean_sec"])
        out["configs"][name] = {
            "step_mean_sec": best["step_mean_sec"],
            "steps_per_sec": round(1.0 / best["step_mean_sec"], 3),
            "phase_mean_sec": best["phase_mean_sec"],
            "phase_min_sec": best["phase_min_sec"],
            "supersteps": best["supersteps"],
            "per_step": best.get("per_step"),
            "legs": [
                {"step_mean_sec": x["step_mean_sec"],
                 "steal_pct_capacity": x["steal_pct_capacity"]}
                for x in recs
            ],
        }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "truncate_ab.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
