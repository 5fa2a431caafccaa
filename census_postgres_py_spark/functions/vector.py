"""Vector math over ArrayType columns — pure Catalyst higher-order
functions (`zip_with` + `aggregate`), no Python in the row path.

Elements are cast float->double BEFORE any arithmetic so results match
an oracle computing in double; folds are sequential left-to-right on
both Spark and DuckDB, keeping accumulation order (and hence float
results) aligned.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
