"""Dataset-production pipeline: the reference's ingest/derive/sample/embed
surface (reference README.md:45-56) re-expressed as DataFrame transforms.
"""

from external_benchmarks_spark.pipeline.dataset import (  # noqa: F401
    add_derived_columns,
    union_sources,
)
from external_benchmarks_spark.pipeline.embedding import embed_text_udf  # noqa: F401
from external_benchmarks_spark.pipeline.index import build_index_layout  # noqa: F401
