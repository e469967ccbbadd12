"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry (or a named subset) at sf0.01, runs its
``oracle_sql()`` twin in DuckDB over the same parquet files, and
compares row count, sorted column names, and order-insensitive values
with *exact* equality — strictly stronger than the driver's value-hash,
so a local pass predicts a driver pass.

Usage:
    python tools/check.py                 # all queries
    python tools/check.py q_agg_groupby   # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from tests.util import assert_scalar_schema, norm_df as _norm_df  # noqa: E402
from ukis_kafka_spark import api  # noqa: E402
from ukis_kafka_spark.plans import get_spark  # noqa: E402
from ukis_kafka_spark.sources import TABLES  # noqa: E402

SF_DIR = os.environ.get(
    "SPARK_GRAFT_SF_DIR", os.environ.get("SF_DIR", "/root/testdata/sf0.01")
)


def _diff_sample(a_rows, b_rows, n=4):
    sa, sb = set(a_rows), set(b_rows)
    only_a = list(sa - sb)[:n]
    only_b = list(sb - sa)[:n]
    out = []
    if only_a:
        out.append(f"  spark-only: {only_a}")
    if only_b:
        out.append(f"  oracle-only: {only_b}")
    return "\n".join(out)


def main() -> int:
    names = sys.argv[1:]
    qs = api.queries()
    oracles = api.oracle_sql()
    if not names:
        names = sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, SF_DIR)
            # EVERY registry entry, rows-only included: the driver
            # canonicalizes rows-only output too (q_agg_approx_quantile
            # r4 crashed it with an ARRAY cell).
            assert_scalar_schema(df, name)
            sdf = df.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        s_cols, s_rows = _norm_df(sdf)
        o_cols, o_rows = _norm_df(odf)
        dt = time.time() - t0
        if s_cols != o_cols:
            print(f"FAIL  {name}: columns differ spark={s_cols} oracle={o_cols}")
            n_fail += 1
        elif len(s_rows) != len(o_rows):
            print(f"FAIL  {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
            print(_diff_sample(s_rows, o_rows))
            n_fail += 1
        elif s_rows != o_rows:
            bad = sum(1 for a, b in zip(s_rows, o_rows) if a != b)
            print(f"FAIL  {name}: {bad}/{len(s_rows)} rows differ")
            print(_diff_sample(s_rows, o_rows))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(s_rows)} rows hash-identical [{dt:.1f}s]")

    missing_oracle = [n for n in names if n not in oracles]
    if missing_oracle:
        print(f"note: rows-only (no oracle): {missing_oracle}")
    print(f"\n{len(names) - n_fail}/{len(names)} passed")

    # FULL-registry sweeps leave a committed, timestamp-free artifact
    # (CHECKS.json) so "the whole registry is green at this scale" is
    # verifiable evidence, not a log claim. Subset runs don't touch it.
    if len(names) == len(qs):
        import json

        sf_tag = os.path.basename(SF_DIR.rstrip("/"))
        art_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CHECKS.json")
        try:
            with open(art_path) as fh:
                art = json.load(fh)
        except (OSError, ValueError):
            art = {}
        art[sf_tag] = {
            "n_queries": len(names),
            "n_pass": len(names) - n_fail,
            "n_fail": n_fail,
            "rows_only": sorted(missing_oracle),
        }
        with open(art_path, "w") as fh:
            json.dump(art, fh, indent=1, sort_keys=True)
        print(f"wrote CHECKS.json[{sf_tag}]")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
