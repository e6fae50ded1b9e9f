"""Dump .explain("formatted") for the round-6 optimization evidence.

Writes plans/r06/<query>_<suffix>.txt for each requested query, running
the query builders from a given repo root — so the same script produces
`_before.txt` from a pristine HEAD worktree and `_after.txt` from the
working tree.

Usage:
    python tools/dump_r06_plans.py <repo_root> <suffix> [sf_dir] [query ...]

Notes:
- plans are dumped at sf0.001 by default (plan SHAPE is sf-independent;
  iterative queries execute their supersteps while building the result,
  so the smallest sf keeps the dump cheap).
- for superstep engines the final-result plan roots at the last
  checkpointed state; a representative mid-loop superstep plan is
  dumped separately for pagerank (suffix `pagerank_step_...`).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")

DEFAULT_QUERIES = [
    "edge_derivation",
    "nodes",
    "triangle_count",
    "clustering_coefficient",
    "ktruss3",
    "hits10",
    "wcc_fast",
    "lpa10",
    "degree_centrality",
    "random_walks",
]


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    repo_root = os.path.abspath(sys.argv[1])
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    queries = sys.argv[4:] or DEFAULT_QUERIES

    sys.path.insert(0, repo_root)
    import __spark_entry__ as entrymod
    from hugegraph_computer_spark.session import get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="hcs-plan-dump", master="local[4]", shuffle_partitions=8)

    qmap = entrymod.queries()
    for name in queries:
        if name == "pagerank_step":
            _dump_pagerank_step(entrymod, spark, sf_dir, suffix)
            continue
        try:
            df = qmap[name](spark, sf_dir)
            text = fmt(df)
        except Exception as exc:  # keep going; record the failure
            text = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted), repo={repo_root}, sf={sf_dir}\n\n")
            f.write(text)
        print("wrote", path, flush=True)

    _dump_pagerank_step(entrymod, spark, sf_dir, suffix)
    spark.stop()


def _dump_pagerank_step(entrymod, spark, sf_dir: str, suffix: str) -> None:
    """One representative PageRank superstep plan (state update +
    scatter), the shape every engine superstep pays — dumped under the
    same planner confs the runner would pick for this graph (the
    data-derived static mode when active, AQE otherwise)."""
    from hugegraph_computer_spark.algorithms import PageRank

    g = entrymod._graph(spark, sf_dir)
    try:
        from hugegraph_computer_spark.engine.pin import static_plan_scope
        from hugegraph_computer_spark.engine.superstep import PregelRunner

        static_p = PregelRunner._static_step_partitions(g, spark)
    except ImportError:  # pre-planner tree (the `before` worktree)
        from contextlib import nullcontext

        static_plan_scope = lambda _s, _p: nullcontext()  # noqa: E731
        static_p = None
    pr = PageRank(l1_tol=0.0, max_supersteps=3)
    pr.prepare(g)
    with static_plan_scope(spark, static_p):
        out0 = pr.superstep0(g)
        st0 = out0.state.localCheckpoint(eager=True)
        msgs0 = out0.make_messages(st0)
        out1 = pr.superstep(
            1, g, st0, msgs0, {"cumulative_rank": 1.0, "dangling_cumulative": 0.0}
        )
        path = os.path.join(OUT_DIR, f"pagerank_step_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# pagerank superstep-1 state plan — sf={sf_dir}, "
                f"planner={'static p=%d' % static_p if static_p else 'aqe'}\n\n"
            )
            f.write(fmt(out1.state))
            f.write("\n\n# superstep-1 message plan\n\n")
            f.write(fmt(out1.make_messages(st0)))
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
