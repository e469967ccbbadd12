"""Checkpoint-recovery / exactly-once test: a streaming aggregation is
stopped mid-stream and restarted from its checkpoint; the final state
must equal the batch answer with no double counting — the guarantee
that replaces the reference's at-least-once + idempotent-upsert
pattern (SURVEY.md §3.2)."""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F

from ukis_kafka_spark.sources import load_table
from ukis_kafka_spark.streaming.jobs import _scratch_dir, replay_events_as_stream

from .conftest import SF_SMOKE


def test_checkpoint_recovery_exactly_once(spark):
    work = _scratch_dir()
    try:
        # stage all 8 chunks, then withhold the last 4
        replay_events_as_stream(spark, SF_SMOKE, work)
        src = os.path.join(work, "src")
        held = os.path.join(work, "held")
        os.makedirs(held)
        files = sorted(os.listdir(src))
        for f in files[4:]:
            shutil.move(os.path.join(src, f), os.path.join(held, f))

        ckpt = os.path.join(work, "ckpt")

        def run_once(name: str):
            stream = (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, event_type string, "
                    "value double, props string"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            counts = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
            q = (
                counts.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {r["event_type"]: r["n"] for r in spark.table(name).collect()}

        partial = run_once("recovery_phase1")
        # "crash": the query is gone; deliver the rest and restart from
        # the SAME checkpoint — processed files must not be re-counted
        for f in files[4:]:
            shutil.move(os.path.join(held, f), os.path.join(src, f))
        final = run_once("recovery_phase2")

        batch = {
            r["event_type"]: r["n"]
            for r in load_table(spark, SF_SMOKE, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert final == batch, f"recovered state diverged: {final} vs batch {batch}"
        assert sum(partial.values()) < sum(final.values())
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_schema_inference_from_props(spark):
    from ukis_kafka_spark.sources.schema_infer import infer_props_schema, project_props

    df = spark.createDataFrame(
        [
            ('{"k": 87, "tag": "a", "score": 1.5, "ok": true}',),
            ('{"k": 12, "tag": "b", "score": 2, "ok": false}',),
            ('{"k": 5, "extra": "only-here"}',),
        ],
        "props_json string",
    )
    schema = infer_props_schema(df)
    assert schema == {
        "k": "bigint",
        "tag": "string",
        "score": "double",  # int+float mix widens to double
        "ok": "boolean",
        "extra": "string",
    }
    out = project_props(df, schema)
    rows = out.orderBy("k").collect()
    assert rows[0]["k"] == 5 and rows[0]["extra"] == "only-here" and rows[0]["tag"] is None
    assert rows[2]["score"] == 1.5 and rows[2]["ok"] is True

    # the corpus's events.props infers its integer key
    e = load_table(spark, SF_SMOKE, "events").withColumnRenamed("props", "props_json")
    assert infer_props_schema(e) == {"k": "bigint"}
