#!/usr/bin/env python
"""Multi-executor smoke (VERDICT r5 item 7): run registry entries vs
their duckdb oracles under ``local-cluster[2,4,2048]`` — two SEPARATE
executor JVMs with their own Python workers, real serialization between
driver and executors, and task locality that local[N] never exercises.
Catches closure-serialization, PYTHONPATH, and driver-state assumptions
a single-JVM run can't.

Usage:
    python scripts/cluster_smoke.py /root/testdata/sf0.01            # contract prefix (50)
    python scripts/cluster_smoke.py /root/testdata/sf0.01 all        # full registry
    python scripts/cluster_smoke.py /root/testdata/sf0.01 streaming-rocksdb
        # every streaming-module entry with RocksDBStateStoreProvider
        # forced session-wide (VERDICT r6 item 6): TWS already requires
        # RocksDB, but the other stateful queries default to the
        # HDFS-backed store — this axis runs them all on the store you'd
        # actually deploy at 100 TB (changelog-checkpointed, bounded-memory)
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    mode = sys.argv[2] if len(sys.argv) > 2 else "contract"
    full = mode == "all"
    rocksdb = mode == "streaming-rocksdb"

    os.environ.setdefault("SPARK_HOME", "/opt/spark")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from pandas_streaming_spark.compat import ensure_protobuf

    ensure_protobuf()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("cluster-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        # executor JVMs spawn fresh Python workers that must import the
        # package AND the protobuf fallback ensure_protobuf just wired
        # into PYTHONPATH (TWS state serde); on a real cluster this is
        # --py-files / a shipped wheel
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.pathsep.join(
                p for p in [REPO, os.environ.get("PYTHONPATH", "")] if p
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if rocksdb:
        spark = spark.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            # the at-scale checkpoint shape: incremental changelog uploads
            # instead of full snapshot per commit
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    spark = spark.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    from pandas_streaming_spark.compare import compare_frames, duckdb_connect

    qs, osql = mod.queries(), mod.oracle_sql()
    if rocksdb:
        from pandas_streaming_spark.queries import (
            kafka_q, stream_upsert_q, streaming_q,
        )

        streaming_names = (
            set(streaming_q.QUERIES) | set(kafka_q.QUERIES)
            | set(stream_upsert_q.QUERIES)
        )
        names = [n for n in qs if n in streaming_names]
    elif full:
        names = list(qs)
    else:
        names = list(qs)[:50]
    con = duckdb_connect(sf_dir)
    fails = 0
    for name in names:
        try:
            if name not in osql:
                print(name, "rows-only:", qs[name](spark, sf_dir).count(), flush=True)
                continue
            r = compare_frames(
                name, qs[name](spark, sf_dir).toPandas(), con.execute(osql[name]).df()
            )
            if not r.ok:
                fails += 1
            print(name, "OK" if r.ok else "FAIL " + r.detail[:200], flush=True)
        except Exception as e:
            fails += 1
            print(name, "ERR", f"{type(e).__name__}: {e}"[:200], flush=True)
    print(
        "TOTAL FAILS:", fails,
        f"({len(names)} entries, local-cluster[2,4,2048], mode={mode})",
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
