"""Registry-wide plan-shape audit: one line per violating entry, exit 1
on any violation. See plans.audit_registry for what is asserted.

Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pandas_streaming_spark.plans import audit_registry
    from pandas_streaming_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = audit_registry(spark, sf_dir)
    for name, hits in bad.items():
        print(name, "VIOLATES", ",".join(hits), flush=True)
    print(json.dumps({"plan_audit": {"violations": bad, "sf_dir": sf_dir}}))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
