"""Vector math over ``array<float>`` embedding columns — pure Catalyst
higher-order functions (zip_with / aggregate), no UDF, no shuffle.

Determinism note: every reduction is an explicit left-to-right sequential
fold in DOUBLE precision, so the result is bit-identical across engines that
evaluate the same fold (the DuckDB oracle uses list_dot_product /
list_sum over DOUBLE[], verified to match exactly on the test vectors).
Reference analog: Debezium's FloatVector/DoubleVector logical types
(core/data/vector/{FloatVector,DoubleVector}.java) carry vectors but define
no math — the similarity operators are part of the training-data pipeline
surface this engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return _fold_sum(prods)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_fold_sum(sq))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
