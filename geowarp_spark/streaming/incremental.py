"""Incremental tiling via Structured Streaming (availableNow trigger).

The reference has no streaming at all (SURVEY §2.10); the north rule asks
for *resumability*, which plans/lineage.py provides for batch.  This
module is the optional stretch path: treat the pages table as a stream
source, window on warc_ts, and maintain per-cell counts incrementally —
``trigger(availableNow=True)`` drains whatever is present and checkpoints,
so repeated invocations are incremental and restart-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid.tiles import cell_sql_expr
from ..sources.pages import LAT_SQL, LON_SQL


def incremental_cell_counts(spark: SparkSession, pages_dir: str,
                            checkpoint_dir: str, out_dir: str,
                            z: int = 8, window: str = "1 hour",
                            watermark: str = "2 hours"):
    """Stream pages parquet -> watermarked tumbling-window per-cell counts.

    Returns the StreamingQuery (already started, availableNow).  The
    caller awaits termination; re-running picks up only new files thanks
    to the checkpoint — the streaming analog of snapshot resume.
    """
    schema = (
        "doc_id bigint, url string, warc_ts timestamp, html binary, "
        "text string, lang string"
    )
    stream = (
        spark.readStream.schema(schema).parquet(pages_dir)
        .withColumn("lon", F.expr(LON_SQL))
        .withColumn("lat", F.expr(LAT_SQL))
        .withColumn("cell", F.expr(cell_sql_expr("lon", "lat", z)))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "cell", "n")
    )
    return (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
