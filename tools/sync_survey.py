"""Regenerate SURVEY.md §2.3's ID lists from the live registry.

The §2.3 inventory is test-enforced (test_survey_inventory_matches_registry)
to list exactly the registry with correct oracle/rows tags; this tool
rewrites the per-family bullet lists, the family header counts, and the
Totals line in place so a new operator registration is one edit away from
a consistent contract. Prose between the lists is preserved.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMILIES = [
    ("Relational/scalar core", lambda n: n.startswith("q_")),
    ("Spatial", lambda n: n.startswith("g_")),
    ("LLM-pipeline (dedup/similarity/text/multimodal/graph)", lambda n: n.startswith("m_")),
    ("Structured Streaming jobs", lambda n: n.startswith("s_")),
    ("UDF surface", lambda n: n.startswith("u_")),
    ("Sinks", lambda n: n.startswith("sink_")),
    ("Sources", lambda n: n.startswith("src_")),
]


def main() -> None:
    from ukis_kafka_spark.api import ORACLE, QUERIES

    path = os.path.join(REPO, "SURVEY.md")
    text = open(path).read()
    head, rest = text.split("### 2.3", 1)
    sec, tail = rest.split("Totals:", 1)

    for title, pred in FAMILIES:
        ids = sorted(n for n in QUERIES if pred(n))
        lines = "\n".join(
            f"- `{n}` — {'oracle' if n in ORACLE else 'rows'}" for n in ids
        )
        pat = re.compile(
            r"(\*\*" + re.escape(title) + r"\*\* )\((\d+)\):\n\n(?:- `[a-z0-9_]+` — (?:oracle|rows)\n)+",
        )
        m = pat.search(sec)
        assert m, f"family header not found: {title}"
        sec = sec[: m.start()] + f"{m.group(1)}({len(ids)}):\n\n{lines}\n" + sec[m.end():]

    covered = sum(
        1 for n in QUERIES if any(pred(n) for _, pred in FAMILIES)
    )
    assert covered == len(QUERIES), "unclassified registry ids"

    tail = re.sub(
        r"\*\*\d+ queries, \d+ oracle-checked, \d+ rows-only\*\*",
        f"**{len(QUERIES)} queries, {len(ORACLE)} oracle-checked, "
        f"{len(QUERIES) - len(ORACLE)} rows-only**",
        tail,
        count=1,
    )
    open(path, "w").write(head + "### 2.3" + sec + "Totals:" + tail)
    print(
        f"synced: {len(QUERIES)} queries, {len(ORACLE)} oracle, "
        f"{len(QUERIES) - len(ORACLE)} rows-only"
    )


if __name__ == "__main__":
    main()
