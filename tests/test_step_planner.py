"""The data-derived static step planner (round 6): partition-count
derivation, result parity vs the AQE conversion, conf restoration —
including on the RunAborted cancel path."""

from __future__ import annotations

import pytest

from hugegraph_computer_spark.algorithms import PageRank, Wcc
from hugegraph_computer_spark.engine import PregelRunner
from hugegraph_computer_spark.engine.superstep import RunAborted


class _G:
    """Minimal graph stand-in for the pure derivation function."""

    def __init__(self, ne, partitions):
        self._ne = ne
        self.partitions = partitions


class _Ctx:
    class sparkContext:
        defaultParallelism = 16


def test_static_partition_derivation(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_STEP_PLANNER", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_STATIC_ROWS_PER_TASK", raising=False)
    derive = PregelRunner._static_step_partitions
    # small graph: p = ceil(E/32768) < partitions -> static at p
    assert derive(_G(152_827, 32), _Ctx) == 5
    assert derive(_G(1, 32), _Ctx) == 1
    # large graph: p >= partitions -> AQE (None), the unchanged path
    assert derive(_G(9_780_000, 8), _Ctx) is None
    assert derive(_G(32 * 32_768, 32), _Ctx) is None  # boundary: p == parts
    # unknown edge count never triggers static mode in auto
    assert derive(_G(None, 32), _Ctx) is None
    # explicit overrides
    monkeypatch.setenv("SPARK_GRAFT_STEP_PLANNER", "aqe")
    assert derive(_G(152_827, 32), _Ctx) is None
    monkeypatch.setenv("SPARK_GRAFT_STEP_PLANNER", "static")
    assert derive(_G(None, 32), _Ctx) == 32
    assert derive(_G(9_780_000, 8), _Ctx) == 8  # forced: clamped to parts


def _confs(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_planner_parity_and_conf_restore(sf_graph, monkeypatch):
    """Static-planned and AQE-planned runs produce identical supersteps
    and ranks (to float noise), and the session confs are restored."""
    spark = sf_graph.vertices.sparkSession
    before = _confs(spark)

    monkeypatch.setenv("SPARK_GRAFT_STEP_PLANNER", "aqe")
    res_aqe = PregelRunner().run(PageRank(l1_tol=0.0, max_supersteps=5), sf_graph)
    monkeypatch.delenv("SPARK_GRAFT_STEP_PLANNER", raising=False)
    res_auto = PregelRunner().run(PageRank(l1_tol=0.0, max_supersteps=5), sf_graph)

    assert _confs(spark) == before
    assert res_auto.supersteps == res_aqe.supersteps
    a = {r["id"]: r["rank"] for r in res_aqe.state.collect()}
    b = {r["id"]: r["rank"] for r in res_auto.state.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)


def test_conf_restored_on_abort(sf_graph):
    spark = sf_graph.vertices.sparkSession
    before = _confs(spark)
    with pytest.raises(RunAborted):
        PregelRunner().run(Wcc(), sf_graph, should_stop=lambda: True)
    assert _confs(spark) == before


def test_scope_noops_when_lock_held(sf_graph):
    """SQL confs are session-global and ComputerDriver runs jobs
    concurrently on one session: a loop that cannot take the static
    scope lock must keep AQE untouched (and still compute correctly)."""
    from hugegraph_computer_spark.engine import pin

    spark = sf_graph.vertices.sparkSession
    before = _confs(spark)
    assert pin._STATIC_SCOPE_LOCK.acquire(blocking=False)
    try:
        with pin.static_plan_scope(spark, 4):
            assert _confs(spark) == before  # no-op: lock owned elsewhere
        res = PregelRunner().run(
            PageRank(l1_tol=0.0, max_supersteps=3), sf_graph
        )
        assert res.supersteps == 3
        assert _confs(spark) == before
    finally:
        pin._STATIC_SCOPE_LOCK.release()
    # lock free again: the scope applies and restores
    with pin.static_plan_scope(spark, 4):
        assert _confs(spark) == ("false", "4")
    assert _confs(spark) == before
