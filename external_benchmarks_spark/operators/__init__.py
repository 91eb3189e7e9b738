"""Operator layer: the engine's user-facing relational + vector operators.

Each operator is a function DataFrame -> DataFrame built from declarative
Spark primitives, so Catalyst owns pushdown/pruning/join selection and the
physical plan scales with partitioning rather than driver memory.
"""

from external_benchmarks_spark.operators.topk import (  # noqa: F401
    filtered_vector_topk,
    per_query_topk,
)
