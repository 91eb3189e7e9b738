"""Stream-stream interval join: clicks attribute to impressions within
the horizon, driven through two real file-source streams."""

from __future__ import annotations

import os
import tempfile
import time
from datetime import datetime


def _write(path, names, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {
        names[0]: [r[0] for r in rows],
        names[1]: pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        names[2]: [r[2] for r in rows],
    }
    pq.write_table(pa.table(cols), path)
    time.sleep(1.05)


def test_interval_join_attributes_within_horizon(spark):
    from external_benchmarks_spark.streaming.joins import interval_join

    t = lambda h, m=0: datetime(2026, 1, 1, h, m)
    with tempfile.TemporaryDirectory() as d:
        imp_dir, clk_dir = os.path.join(d, "imp"), os.path.join(d, "clk")
        os.makedirs(imp_dir)
        os.makedirs(clk_dir)
        _write(
            os.path.join(imp_dir, "i1.parquet"),
            ["user_id", "imp_ts", "ad_id"],
            [("u1", t(0, 0), "adA"), ("u2", t(0, 5), "adB"), ("u3", t(0, 0), "adC")],
        )
        _write(
            os.path.join(clk_dir, "c1.parquet"),
            ["user_id", "ts", "click_id"],
            [
                ("u1", t(0, 30), "c1"),   # 30 min after adA -> attributed
                ("u2", t(3, 0), "c2"),    # 2h55 after adB -> outside 1h horizon
                ("u4", t(0, 10), "c3"),   # no impression at all
            ],
        )

        clicks = spark.readStream.schema(
            "user_id string, ts timestamp, click_id string"
        ).parquet(clk_dir)
        imps = spark.readStream.schema(
            "user_id string, imp_ts timestamp, ad_id string"
        ).parquet(imp_dir)

        joined = interval_join(
            clicks, imps, on="user_id", left_ts="ts", right_ts="imp_ts",
            horizon="1 hour",
        )
        got: list[tuple] = []
        q = (
            joined.writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r.user_id, r.click_id, r.ad_id) for r in df.collect()
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        assert set(got) == {("u1", "c1", "adA")}


def test_interval_join_outer_flushes_unmatched_after_watermark(spark):
    """LEFT OUTER stream-stream join: unmatched clicks must surface with
    null ad columns once the watermark passes them. Bounded replays need
    the heartbeat pattern (late sentinel events on BOTH sides + one more
    batch) so the final watermark advance actually flushes — the exact
    operational detail the operator's docstring documents."""
    from external_benchmarks_spark.streaming.joins import interval_join_outer

    t = lambda h, m=0: datetime(2026, 1, 1, h, m)
    with tempfile.TemporaryDirectory() as d:
        imp_dir, clk_dir = os.path.join(d, "imp"), os.path.join(d, "clk")
        os.makedirs(imp_dir)
        os.makedirs(clk_dir)
        _write(
            os.path.join(imp_dir, "i1.parquet"),
            ["user_id", "imp_ts", "ad_id"],
            [("u1", t(0, 0), "adA"), ("u2", t(0, 5), "adB")],
        )
        _write(
            os.path.join(clk_dir, "c1.parquet"),
            ["user_id", "ts", "click_id"],
            [
                ("u1", t(0, 30), "c1"),  # within 1h of adA -> matched
                ("u2", t(3, 0), "c2"),   # 2h55 after adB -> unmatched
                ("u4", t(0, 10), "c3"),  # no impression -> unmatched
            ],
        )
        # heartbeat wave 1: advance both sources' event time far past the
        # data; wave 2: one more batch so the advanced watermark is USED
        _write(
            os.path.join(imp_dir, "i2.parquet"),
            ["user_id", "imp_ts", "ad_id"],
            [("_hb_i", t(12), "hb")],
        )
        _write(
            os.path.join(clk_dir, "c2.parquet"),
            ["user_id", "ts", "click_id"],
            [("_hb_c", t(12), "hb1")],
        )
        _write(
            os.path.join(clk_dir, "c3.parquet"),
            ["user_id", "ts", "click_id"],
            [("_hb_c2", t(13), "hb2")],
        )

        clicks = (
            spark.readStream.schema("user_id string, ts timestamp, click_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(clk_dir)
        )
        imps = (
            spark.readStream.schema("user_id string, imp_ts timestamp, ad_id string")
            .option("maxFilesPerTrigger", 1)
            .parquet(imp_dir)
        )
        joined = interval_join_outer(
            clicks, imps, on="user_id", left_ts="ts", right_ts="imp_ts",
            horizon="1 hour", left_watermark="10 minutes",
            right_watermark="10 minutes",
        )
        got: list[tuple] = []
        q = (
            joined.writeStream.foreachBatch(
                lambda df, bid: got.extend(
                    (r.user_id, r.click_id, r.ad_id) for r in df.collect()
                )
            )
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        real = {g for g in got if not g[0].startswith("_hb")}
        assert real == {
            ("u1", "c1", "adA"),
            ("u2", "c2", None),
            ("u4", "c3", None),
        }
