"""The reference lifecycle, end to end on this engine: vector file →
envelope topic → decoded feature table → spatial filtering →
keyed upsert "PostGIS" table (+ the real DDL it would run) → GeoJSON
export.  This is the path a dlr-eoc/ukis_kafka user walks today
(producer CLI → Kafka → PostGIS/filesystem consumer), re-based on
Spark with the offline topic-dir stand-in (sources/kafka.py flips the
same pipeline to a live broker via UKIS_KAFKA_BROKERS).

    python examples/geo_lifecycle_demo.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ukis_kafka_spark import cli  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402
from ukis_kafka_spark.sinks.postgis import create_table_ddl  # noqa: E402


def main() -> None:
    spark = get_spark("geo-lifecycle-demo")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(REPO, ".tmp"), exist_ok=True)
    work = tempfile.mkdtemp(prefix="geodemo_", dir=os.path.join(REPO, ".tmp"))
    try:
        # 1. a vector file arrives (flood-mask-ish polygons + stations)
        fc = {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[11.0 + i, 48.0], [11.5 + i, 48.0],
                                         [11.5 + i, 48.4], [11.0 + i, 48.4],
                                         [11.0 + i, 48.0]]],
                    },
                    "properties": {"fid": i, "kind": "flood_mask", "pass": i % 2},
                }
                for i in range(6)
            ]
            + [
                {
                    "type": "Feature",
                    "geometry": {"type": "Point", "coordinates": [11.2 + i, 48.2]},
                    "properties": {"fid": 100 + i, "kind": "station", "pass": 0},
                }
                for i in range(4)
            ],
        }
        vec = os.path.join(work, "masks.geojson")
        with open(vec, "w") as fh:
            json.dump(fc, fh)

        # 2. producer: vector file → envelope topic (R1+R2)
        topic = os.path.join(work, "topic")
        assert cli.main(["produce", "--geojson", vec, "--topic-dir", topic,
                         "--layer", "flood"]) == 0

        # 3. consumer: decode + filter + last-write-wins upsert (R7+R9)
        table = os.path.join(work, "pg_table")
        assert cli.main(["consume-upsert", "--topic-dir", topic,
                         "--table", table, "--key", "fid"]) == 0
        feats = spark.read.parquet(table)
        polys = feats.where(F.col("geom_type") == "POLYGON")
        print(f"upserted {feats.count()} features "
              f"({polys.count()} polygons) into {table}")

        # 4. the DDL the live PostGIS sink would run (sinks/postgis.py)
        print(create_table_ddl(feats.drop("offset").schema, "flood_masks",
                               key_cols=["fid"], geom_col="wkb", srid=4326))

        # 5. re-deliver the topic: idempotence (the reference's
        #    at-least-once + keyed upsert contract)
        n_before = feats.count()
        assert cli.main(["consume-upsert", "--topic-dir", topic,
                         "--table", table, "--key", "fid"]) == 0
        assert spark.read.parquet(table).count() == n_before
        print(f"re-delivery is a no-op: still {n_before} rows")

        # 6. export leg: the curated table back out as GeoJSON
        out = os.path.join(work, "flood.geojson")
        assert cli.main(["consume-geojson", "--topic-dir", topic,
                         "--out", out, "--collection"]) == 0
        n = len(json.load(open(out))["features"])
        print(f"exported {n} features to {out}")
        assert n == 10
        print("geo_lifecycle OK")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
