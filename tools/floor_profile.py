"""Attribute the fixed per-superstep floor: run PageRank on a
floor-bound input (small per-step data) with SPARK_GRAFT_STEP_PROFILE
and report per-phase walls — plan build (Python/Catalyst), lazy
localCheckpoint RDD conversion (happens at CALL time, outside the
action), the aggregate action (scheduling + execution), and the
message-plan build. The verdict's open question: is the ~1.4 s/step
serial floor the RDD conversion or the agg job setup?

Usage: SPARK_GRAFT_CPUS=8 python tools/floor_profile.py [sf_dir] [expand]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["SPARK_GRAFT_STEP_PROFILE"] = "1"

from hugegraph_computer_spark.algorithms import PageRank
from hugegraph_computer_spark.engine import PregelRunner
from hugegraph_computer_spark.graph import Graph, transcripts_from_events
from hugegraph_computer_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    expand = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    densify = os.environ.get("SPARK_GRAFT_DENSIFY", "1") == "1"

    spark = get_spark(
        app_name="hcs-floor-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    g = Graph.from_transcripts(
        transcripts_from_events(spark, sf_dir, expand=expand), partitions=cpus
    )
    if densify:
        g, _ = g.densify()
        g.edges.count()

    # SPARK_GRAFT_PROFILE_MAX_STEPS: cap the loop for configs whose
    # per-step cost GROWS with the step index (state_mode=cache plans
    # an exponentially-nested tree once prior caches drop) — a capped
    # window still shows the growth curve without hanging the A/B
    max_steps = int(os.environ.get("SPARK_GRAFT_PROFILE_MAX_STEPS", "30"))
    res = PregelRunner().run(
        PageRank(l1_tol=1e-6, max_supersteps=max_steps), g
    )
    # skip the first two steps (JVM/codegen warmup) for the floor stats
    steady = [h["phase_seconds"] for h in res.history[2:]]
    if not steady:
        print(
            json.dumps(
                {
                    "error": "run converged in <= 2 supersteps; no steady "
                    "window to profile — use a slower-converging input",
                    "supersteps": res.supersteps,
                    "per_step": [h["phase_seconds"] for h in res.history],
                }
            )
        )
        spark.stop()
        return
    n = max(1, len(steady))
    mean = {k: round(sum(p[k] for p in steady) / n, 3) for k in steady[0]}
    mins = {k: round(min(p[k] for p in steady), 3) for k in steady[0]}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "expand": expand,
                "cpus": cpus,
                "densified": densify,
                "supersteps": res.supersteps,
                "steady_steps": len(steady),
                "phase_mean_sec": mean,
                "phase_min_sec": mins,
                "step_mean_sec": round(
                    sum(h["seconds"] for h in res.history[2:]) / n, 3
                ),
                "per_step": steady,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
