"""Benchmark runner (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{name: sec, ...}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution,
no driver-side collect). The flagship runs once untimed first to warm
the JVM/codegen caches.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from ukis_kafka_spark import api  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = api.queries()

    _force(qs[api.FLAGSHIP](spark, sf_dir))  # warmup

    times: dict[str, float] = {}
    for name in sorted(qs):
        t0 = time.time()
        _force(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_num,
            }
        )
    )


if __name__ == "__main__":
    main()
