"""SubGraphMatch — subgraph-pattern matching as multi-way joins.

Reference: /root/reference/computer-algorithm/.../path/subgraph/
SubGraphMatch.java:47-274: a query-graph JSON is decomposed into a
min-height spanning tree whose leaves flood partial matches upward
until the root assembles full bindings. In Spark the same enumeration
is a sequence of equi-joins over the edge table — one join per pattern
edge — which Catalyst orders and executes as hash joins; the
reference's tree-message protocol IS a hand-rolled join plan, so this
re-expression is the Spark-first design, not a shortcut.

Input surfaces (both reference-parity):
- programmatic: pattern = list of (src_var, dst_var, etype|None) or
  (src_var, dst_var, etype|None, edge_filter) plus per-variable vertex
  constraints {var: (label|None, property_filter|None)};
- query-graph JSON in the reference's format
  (QueryGraphDescribe.java:37-128): a list of vertex describes
  `{"id", "label", "property_filter", "edges": [{"targetId", "label",
  "property_filter"}]}`. The reference compiles `property_filter`
  with Aviator (ExpressionUtil); here the same config strings are SQL
  boolean expressions compiled by Catalyst (functions/expressions.py
  rationale) over the vertex-property / edge columns.

Vertex properties: the derived graph encodes vertex kind and
attributes in the id scheme (graph/derive.py), exposed by
`vertex_properties` as queryable columns: label ('turn'|'role'|'tool'),
name (role/tool name), conv_id + turn_idx (turn nodes). Injectivity
(distinct vertices per distinct variables) is enforced pairwise, like
subgraph isomorphism requires.
"""

from __future__ import annotations

import json
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hugegraph_computer_spark.functions.expressions import predicate

# (src_var, dst_var, etype|None[, edge_filter|None])
PatternEdge = tuple


def vertex_properties(g) -> DataFrame:
    """(id, label, name, conv_id, turn_idx) — the vertex-property view
    the query-graph predicates run against. Pure column expressions
    over the (cached) vertex table; mirrored verbatim by the DuckDB
    oracle (oracles/sql.py vprops CTE)."""
    is_role = F.col("id").startswith("role:")
    is_tool = F.col("id").startswith("tool:")
    label = (
        F.when(is_role, F.lit("role"))
        .when(is_tool, F.lit("tool"))
        .otherwise(F.lit("turn"))
    )
    name = F.when(is_role | is_tool, F.substring(F.col("id"), 6, 1 << 20))
    conv_id = F.when(~(is_role | is_tool), F.split(F.col("id"), "#")[0])
    turn_idx = F.when(
        ~(is_role | is_tool), F.split(F.col("id"), "#")[1].cast("int")
    )
    return g.vertices.select(
        "id",
        label.alias("label"),
        name.alias("name"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
    )


def parse_query_graph(
    describe: str | list,
) -> tuple[dict[str, tuple[str | None, str | None]], list[PatternEdge]]:
    """Parse the reference's query-graph JSON
    (QueryGraphDescribe.VertexDescribe/EdgeDescribe fields: id, label
    required; property_filter, edges optional; QueryGraph.java:44-82
    requires every edge target to name a declared vertex) into
    (vertex_constraints, pattern_edges). label '*' means any label."""
    describes = json.loads(describe) if isinstance(describe, str) else describe
    if not describes:
        raise ValueError("query graph must have at least one vertex")
    vconstraints: dict[str, tuple[str | None, str | None]] = {}
    pattern: list[PatternEdge] = []
    for v in describes:
        label = v["label"] if v.get("label") not in (None, "*") else None
        vconstraints[v["id"]] = (label, v.get("property_filter") or None)
    for v in describes:
        for e in v.get("edges") or []:
            if e["targetId"] not in vconstraints:
                raise ValueError(
                    f"edge target {e['targetId']!r} not declared as a vertex"
                )
            elabel = e["label"] if e.get("label") not in (None, "*") else None
            pattern.append(
                (v["id"], e["targetId"], elabel, e.get("property_filter") or None)
            )
    if not pattern:
        raise ValueError("query graph must have at least one edge")
    in_pattern = {v for e in pattern for v in (e[0], e[1])}
    orphans = sorted(set(vconstraints) - in_pattern)
    if orphans:
        # QueryGraph semantics: every declared vertex is a match
        # variable; silently dropping one would also drop its
        # label/property constraints (QueryGraph.java:44-82)
        raise ValueError(
            f"declared vertices {orphans} appear in no pattern edge; "
            "every vertex describe must be connected"
        )
    return vconstraints, pattern


def subgraph_match(
    g,
    pattern: list[PatternEdge],
    injective: bool = True,
    vertex_constraints: dict[str, tuple[str | None, str | None]] | None = None,
) -> DataFrame:
    """Returns one column per pattern variable, one row per match.

    Per-variable (label, property_filter) constraints become allowed-id
    sets (filters over `vertex_properties`, so pruning happens before
    the joins); each pattern-edge leg left-semi joins its endpoints
    against the constrained sets — at scale these are broadcast-able
    equi-joins Catalyst places below the match joins."""
    props = vertex_properties(g) if vertex_constraints else None
    allowed: dict[str, DataFrame] = {}
    for var, (label, pfilter) in (vertex_constraints or {}).items():
        if label is None and pfilter is None:
            continue
        a = props
        if label is not None:
            a = a.where(F.col("label") == label)
        if pfilter is not None:
            a = a.where(predicate(pfilter))
        allowed[var] = a.select("id")

    out: DataFrame | None = None
    bound: set[str] = set()
    for i, edge in enumerate(pattern):
        a, b, etype = edge[0], edge[1], edge[2]
        efilter = edge[3] if len(edge) > 3 else None
        e = g.edges
        if etype is not None:
            e = e.where(F.col("etype") == etype)
        if efilter is not None:
            e = e.where(predicate(efilter))
        e = e.select(F.col("src").alias(a), F.col("dst").alias(b)).distinct()
        for var in (a, b):
            if var in allowed:
                e = e.join(
                    allowed[var].select(F.col("id").alias(var)), var, "left_semi"
                )
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


def subgraph_match_json(g, describe: str | list, injective: bool = True) -> DataFrame:
    """Reference input surface: run SubGraphMatch from a query-graph
    JSON string (the `subgraph.query_graph_config` job param,
    SubGraphMatch.java:47-78)."""
    vconstraints, pattern = parse_query_graph(describe)
    return subgraph_match(
        g, pattern, injective=injective, vertex_constraints=vconstraints
    )
