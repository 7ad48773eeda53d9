"""J8: durable streaming sink — parquet + checkpoint gives exactly-once
across query restarts (the property the reference's append-only S3
model cannot offer)."""

import pyspark.sql.functions as F

from novlake_spark.sources.tables import load_table


def test_parquet_sink_exactly_once_across_restart(spark, sf_small, tmp_path):
    events = load_table(spark, sf_small, "events")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events.limit(300).repartition(3).write.parquet(src)

    def run_query():
        stream = spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "2").parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_query()
    first = spark.read.parquet(sink).count()
    # restart with the same checkpoint: no new source data -> no new rows,
    # no duplicates (offsets are committed in the checkpoint log)
    run_query()
    assert spark.read.parquet(sink).count() == first == 300

    # new data arrives -> only the delta is appended
    events.limit(350).exceptAll(events.limit(300)).write.mode("append").parquet(src)
    run_query()
    assert spark.read.parquet(sink).count() == 350
    # content equality, not just counts
    sunk = {r.event_id for r in spark.read.parquet(sink).select("event_id").collect()}
    want = {r.event_id for r in events.limit(350).select("event_id").collect()}
    assert sunk == want
