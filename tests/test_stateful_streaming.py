"""Custom stateful streaming operator: applyInPandasWithState running
totals accumulate across micro-batches (checkpointed restarts included)
and match the batch aggregate."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acled_spark.streaming import stateful_user_totals
from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_totals_accumulate_across_batches(spark, tmp_path):
    bronze = os.path.join(str(tmp_path), "bronze")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    out = os.path.join(str(tmp_path), "out")
    ev = load(spark, SF_DIR, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)

    def drain():
        """availableNow run; update-mode rows land in parquet via
        foreachBatch (memory sink cannot recover from a checkpoint)."""

        def sink(bdf, bid):
            if not bdf.isEmpty():
                bdf.withColumn("batch_id", F.lit(bid)).write.mode(
                    "append"
                ).parquet(out)

        q = (
            stateful_user_totals(
                spark.readStream.schema(ev.schema).parquet(bronze)
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest emitted row per user = current running total
        w = Window.partitionBy("user_id").orderBy(F.desc("batch_id"))
        latest = (
            spark.read.parquet(out)
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
        )
        return {
            r["user_id"]: (r["event_count"], r["total_value"])
            for r in latest.collect()
        }

    def expected(df):
        return {
            r["user_id"]: (r["cnt"], r["tv"])
            for r in df.groupBy("user_id")
            .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("tv"))
            .collect()
        }

    half1.write.mode("append").parquet(bronze)
    assert drain() == expected(half1)

    # second file arrives; the RESTARTED query recovers state from the
    # checkpoint and folds the new batch in
    half2.write.mode("append").parquet(bronze)
    assert drain() == expected(ev)
