#!/usr/bin/env python
"""Registry-wide redundant-scan + exchange-outlier detector (r16,
VERDICT r15 item 5).

For every batch registry entry, build the DataFrame (no execution) and
report from the physical plan:

- ``rescans``: input locations scanned by more than one scan operator —
  the q81 pattern (a whole extra corpus pass feeding one scalar) made
  mechanically visible. Repeated scans are not automatically wrong
  (self-joins, TF/DF branches); the output is a ranked WORKLIST, not a
  violation gate.
- ``exchanges``: Exchange-operator count, to surface N-exchange
  outliers (guide §2.4).

Writes the full report to plans/r16/scan_audit.json and prints the
top offenders. Streaming-replay modules are skipped (building their
frames RUNS the replay; their plan discipline is pinned by tests).

Usage: python scripts/scan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pandas_streaming_spark.plans import (
        PLAN_AUDIT_SKIP_MODULES,
        exchange_count,
        scan_locations,
    )
    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="scan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name, fn in QUERIES.items():
        if any(m in fn.__module__ for m in PLAN_AUDIT_SKIP_MODULES):
            continue
        try:
            df = fn(spark, sf_dir)
            locs = scan_locations(df)
            rescans = {
                os.path.basename(p.rstrip("/")): n
                for p, n in locs.items()
                if n > 1
            }
            report[name] = {
                "scans_total": sum(locs.values()),
                "rescans": rescans,
                "exchanges": exchange_count(df),
            }
        except Exception as e:  # report, never abort the sweep
            errors[name] = f"{type(e).__name__}: {e}"[:160]

    ranked_rescan = sorted(
        (
            (name, r)
            for name, r in report.items()
            if r["rescans"]
        ),
        key=lambda t: -max(t[1]["rescans"].values()),
    )
    ranked_exchanges = sorted(
        report.items(), key=lambda t: -t[1]["exchanges"]
    )[:20]

    print(f"== entries rescanning an input ({len(ranked_rescan)}) ==")
    for name, r in ranked_rescan:
        print(f"{name:40s} rescans={r['rescans']} exchanges={r['exchanges']}")
    print("== top-20 exchange counts ==")
    for name, r in ranked_exchanges:
        print(f"{name:40s} exchanges={r['exchanges']} "
              f"scans={r['scans_total']}")
    if errors:
        print(f"== errors ({len(errors)}) ==")
        for name, e in errors.items():
            print(name, e)

    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    out = {
        "sf_dir": sf_dir,
        "entries": report,
        "rescan_worklist": [
            {"query": n, **r} for n, r in ranked_rescan
        ],
        "top_exchanges": [
            {"query": n, **r} for n, r in ranked_exchanges
        ],
        "errors": errors,
    }
    with open(os.path.join(out_dir, "scan_audit.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.join(out_dir, 'scan_audit.json')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
