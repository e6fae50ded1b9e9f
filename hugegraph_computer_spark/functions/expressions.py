"""Expression-config entry point — the reference's aviator DSL surface.

The reference compiles filter expressions from JSON job params at
runtime (ExpressionUtil.java:28-52; e.g. RingsDetectionWithFilter and
Links take `vertex_filter` / `edge_filter` strings like
"$element.property > 3", LinksConditionDescribe.java:80). The Spark
analogue is SQL-expression strings compiled by Catalyst: `F.expr()`
over the vertex/edge DataFrame columns — strictly more powerful
(whole-stage-codegen'd, optimizer-visible, pushdown-able) than an
interpreted per-row aviator call.

`predicate` accepts either form so config-driven jobs pass strings
("etype = 'reply' AND weight > 0.5") and programmatic callers pass
Columns; algorithms coerce through it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def predicate(expr: Column | str | None) -> Column | None:
    """Coerce a config string (SQL boolean expression over the target
    DataFrame's columns) or a Column into a Column predicate."""
    if expr is None or isinstance(expr, Column):
        return expr
    return F.expr(expr)
