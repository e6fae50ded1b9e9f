"""SubGraphMatch — subgraph-pattern matching as multi-way joins.

Reference: /root/reference/computer-algorithm/.../path/subgraph/
SubGraphMatch.java:47-274: a query-graph JSON is decomposed into a
min-height spanning tree whose leaves flood partial matches upward
until the root assembles full bindings. In Spark the same enumeration
is a sequence of equi-joins over the edge table — one join per pattern
edge — which Catalyst orders and executes as hash joins; the
reference's tree-message protocol IS a hand-rolled join plan, so this
re-expression is the Spark-first design, not a shortcut.

Pattern = list of (src_var, dst_var, etype|None). Variables bind to
vertex ids; matches are rows of distinct variable bindings. Injectivity
(distinct vertices per distinct variables) is enforced pairwise, like
subgraph isomorphism requires.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def subgraph_match(
    g, pattern: list[tuple[str, str, str | None]], injective: bool = True
) -> DataFrame:
    """Returns one column per pattern variable, one row per match."""
    out: DataFrame | None = None
    bound: set[str] = set()
    for i, (a, b, etype) in enumerate(pattern):
        e = g.edges
        if etype is not None:
            e = e.where(F.col("etype") == etype)
        e = e.select(F.col("src").alias(a), F.col("dst").alias(b)).distinct()
        if out is None:
            out = e
            bound = {a, b}
            continue
        on = [v for v in (a, b) if v in bound]
        if not on:
            raise ValueError(f"pattern edge {i} disconnected from prior edges")
        out = out.join(e, on=on, how="inner")
        bound |= {a, b}
    assert out is not None
    if injective:
        for x, y in combinations(sorted(bound), 2):
            out = out.where(F.col(x) != F.col(y))
    return out.select(*sorted(bound)).distinct()
