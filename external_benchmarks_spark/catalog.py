"""Dataset registry: logical name -> parquet path -> DataFrame / temp view.

Mirrors the reference's dataset registry (a dict of scale-variant name to
parquet filename, reference scripts/generate_benchmark_reports.py:44-49)
but generalized: a catalog is rooted at a directory and every ``<name>``
resolves to ``<root>/<name>.parquet``.

At 100 TB the "file" would be a partitioned parquet/Delta directory; the
API is unchanged because ``spark.read.parquet`` takes either.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Tables the driver's testdata provides (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize events.ts across testdata vintages and expose integer
    companions: ``ts`` (microsecond timestamp), ``ts_us`` (exact long
    microseconds), ``ts_ns`` (exact long nanoseconds).

    The driver's parquet has shipped ``ts`` either as TIMESTAMP(NANOS)
    (read as ns-since-epoch long under nanosAsLong) or as plain
    TIMESTAMP(MICROS) (read as timestamp / timestamp_ntz); all vintages
    converge to the same three columns — ``ts`` always ends up TIMESTAMP
    (LTZ), which ``withWatermark`` requires — so every downstream operator
    is vintage-independent.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # Integer division (DIV), not float division: ts_ns ~ 1.7e18 exceeds
        # double's 53-bit mantissa, so `/ 1000` would misround microseconds.
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts_us", F.expr("ts_ns DIV 1000"))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    elif dt in ("timestamp", "timestamp_ntz"):
        if dt == "timestamp":
            ts_us = F.unix_micros(F.col("ts"))
        else:
            # NTZ wall-clock interpreted as UTC. A cast (implicit or via
            # to_utc_timestamp) would go through the SESSION timezone and
            # silently shift epochs on non-UTC sessions, diverging from the
            # ns-long vintage and the DuckDB oracle's epoch_us — so derive
            # the epoch arithmetically from wall-clock fields instead.
            ts_us = (
                F.unix_date(F.col("ts").cast("date")).cast("long") * F.lit(86400000000)
                + (F.hour("ts") * 3600 + F.minute("ts") * 60).cast("long") * F.lit(1000000)
                + F.expr("CAST(extract(second FROM ts) * 1000000 AS BIGINT)")
            )
        df = (
            df.withColumn("ts_us", ts_us)
            .withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
    elif dt is not None:
        raise TypeError(
            f"events.ts has unsupported dtype {dt!r}; expected bigint (ns-long "
            "vintage), timestamp, or timestamp_ntz"
        )
    return df


class Catalog:
    """Logical-name -> DataFrame resolver over a directory of parquet tables."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name == "events":
                # events.ts is parquet TIMESTAMP(NANOS); Spark needs this
                # session conf to read it (as ns-long). Set here so the
                # engine works on ANY caller-provided session, not only
                # ones built by session.get_spark().
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = self.spark.read.parquet(self.path(name))
            if name == "events":
                df = _normalize_events(df)
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        """Register each table as a temp view so spark.sql() can see them."""
        for name in names:
            if os.path.exists(self.path(name)):
                self.table(name).createOrReplaceTempView(name)


def load_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)
