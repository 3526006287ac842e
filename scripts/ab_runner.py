#!/usr/bin/env python
"""One leg of an interleaved A/B timing run (r15 protocol for the
bursty host): launched once per (code-root, rep); times each named
query with the noop sink and appends one JSON line per query to the
output file. The orchestrator alternates legs A,B,A,B,... so host
bursts hit both versions equally; compare per-query MEDIANS (or mins)
across legs.

Usage: python ab_runner.py <code_root> <tag> <out_jsonl> <q1,q2,...> [runs_per_leg]
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    code_root, tag, out_path, qlist = sys.argv[1:5]
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    sys.path.insert(0, code_root)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark

    spark = get_spark(app_name=f"ab-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    # ADVICE r15: exact-name matching — prefix matching let 'q18' time
    # q181/q183/q185/... and contaminate A/B medians. A still-allowed
    # deliberate prefix must end with '_'; warn when one expands to
    # several queries.
    names: list[str] = []
    for p in qlist.split(","):
        if p in QUERIES:
            hits = [p]
        elif p.endswith("_"):
            hits = [n for n in QUERIES if n.startswith(p)]
            if len(hits) > 1:
                print(f"WARNING: prefix {p!r} matched {len(hits)} queries: "
                      f"{hits}", file=sys.stderr)
        else:
            raise SystemExit(
                f"unknown query {p!r} (exact names only; a deliberate "
                f"prefix must end with '_')"
            )
        names.extend(h for h in hits if h not in names)
    out = open(out_path, "a")
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"ab {tag} {name} warm")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"ab {tag} {name} {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out.write(json.dumps({"tag": tag, "q": name, "sec": round(dt, 4),
                                  "t": round(time.time())}) + "\n")
            out.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
