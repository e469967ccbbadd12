"""Per-query timing probe for optimization work: time a named subset
of queries in ONE warm session (flagship warmup + shared caches, same
methodology as bench.py), N reps each, print min/median, and
optionally dump the formatted plan.

Usage:
    python tools/timeq.py m_lsh_sweep m_incremental_dedup      # 3 reps
    REPS=5 python tools/timeq.py m_lsh_sweep
    PLAN_DIR=plans/r11 PLAN_TAG=before python tools/timeq.py m_lsh_sweep
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ukis_kafka_spark import api  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "3"))
    plan_dir = os.environ.get("PLAN_DIR")
    plan_tag = os.environ.get("PLAN_TAG", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    qs = api.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown: {unknown}", file=sys.stderr)
        return 2

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(qs[api.FLAGSHIP](spark, sf_dir))  # warm JVM/codegen
    for name in names:
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            force(qs[name](spark, sf_dir))
            ts.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:34s} min={min(ts):6.2f} med={statistics.median(ts):6.2f} "
            f"all={[round(t, 2) for t in ts]}",
            flush=True,
        )
        if plan_dir:
            os.makedirs(os.path.join(REPO, plan_dir), exist_ok=True)
            out = os.path.join(REPO, plan_dir, f"{name}_{plan_tag}.txt")
            with open(out, "w") as f:
                jdf = qs[name](spark, sf_dir)._jdf
                mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
                f.write(jdf.queryExecution().explainString(mode))
    return 0


if __name__ == "__main__":
    sys.exit(main())
