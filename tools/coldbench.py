"""Cold-start profile: one representative query per family, each in a
FRESH JVM (fresh Catalyst/codegen caches, fresh parquet footer cache),
timed cold (first execution) and warm (same session, second
execution).

bench.py times warm queries after a flagship warmup — correct for
comparing plans, but as the registry grows the 2x budget gate could be
silently absorbed by cache warm-up (VERDICT r5 item 6). This tool
pins the cold/warm ratio per family so that drift is visible.

Usage: python tools/coldbench.py        (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# family representative: a mid-weight, oracle-green query per family
REPS = {
    "q": "q_agg_groupby",
    "g": "g_haversine",
    "m": "m_tfidf",
    "u": "u_pandas_udf",
    "src": "src_jsonl_roundtrip",
    "s": "s_stateful_count",
}

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ukis_kafka_spark import api
from ukis_kafka_spark.plans import get_spark

name = {name!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("coldbench")
spark.sparkContext.setLogLevel("ERROR")
fn = api.QUERIES[name]

def force():
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

t0 = time.monotonic(); force(); cold = time.monotonic() - t0
t0 = time.monotonic(); force(); warm = time.monotonic() - t0
print(json.dumps({{"cold": cold, "warm": warm}}))
"""


def main() -> int:
    out = {}
    for fam, name in REPS.items():
        code = _CHILD.format(repo=REPO, name=name)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=600,
                cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            # a hung representative must not abort the whole profile —
            # record it like any other per-family failure
            out[fam] = {"query": name, "error": "timeout after 600s"}
            continue
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not line:
            out[fam] = {"query": name, "error": proc.stderr[-300:]}
            continue
        r = json.loads(line[-1])
        out[fam] = {
            "query": name,
            "cold_sec": round(r["cold"], 3),
            "warm_sec": round(r["warm"], 3),
            "ratio": round(r["cold"] / max(r["warm"], 1e-9), 2),
        }
    print(json.dumps({"sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"), "families": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
