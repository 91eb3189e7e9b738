"""external_benchmarks_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of superlinked/external-benchmarks.

The reference (studied read-only at /root/reference) is a vector-search
benchmark suite: a filtered ANN top-k query workload (README.md:58-83), a
dataset-production pipeline (README.md:45-56), and an analysis/reporting
pipeline (scripts/generate_benchmark_reports.py). This package re-expresses
all three surfaces Spark-first:

- ``session``     — SparkSession factory tuned for the workload (Arrow, AQE).
- ``catalog``     — dataset registry: logical name -> parquet path -> temp view.
- ``functions``   — vector / text / hashing scalar functions, each with a
                    Catalyst (JVM) form and, where it pays, an Arrow-batched
                    pandas fast path.
- ``operators``   — relational + vector operators: filtered vector top-k,
                    stats/profiling aggregates, dedup (exact/MinHash/SimHash/
                    Jaccard/embedding), similarity search, sessionization,
                    deterministic sampling.
- ``pipeline``    — dataset production: derived columns, multi-source union,
                    embedding (stub), index-layout build.
- ``streaming``   — micro-batch upsert path (README.md:69-70 analog).
- ``multimodal``  — binary-column plumbing with stubbed decoders.

Everything is DataFrame-declarative so Catalyst handles pushdown, pruning,
join selection, and AQE handles skew at the 100 TB design point.
"""

__version__ = "0.1.0"

from external_benchmarks_spark.session import get_spark  # noqa: F401
