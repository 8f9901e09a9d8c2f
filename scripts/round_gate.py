#!/usr/bin/env python
"""One-command driver simulation: the three graded checks in sequence.

1. t1 smoke  — vanilla SparkSession, entry() at sf0.001 (rows >= 0)
2. t2 gate   — every queries() entry at sf0.01 vs its oracle_sql() twin in
               DuckDB (row count + column names + order-insensitive values);
               rows-only queries checked for execution + determinism
3. bench     — bench.py subprocess at $SPARK_GRAFT_SF_DIR (JSON parseable)

Exit code 0 only if everything passes.  Run before ending a round:
    python scripts/round_gate.py
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)

    spark = SparkSession.builder.master("local[8]").appName("round-gate").getOrCreate()
    failures: list[str] = []

    # 1. t1 smoke
    rows = mod.entry(spark).collect()
    print(f"[t1] entry() -> {rows} ({'OK' if len(rows) >= 1 else 'FAIL'})")
    if not rows:
        failures.append("entry")

    # 2. t2 correctness
    qs, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    t0 = time.time()
    for name in sorted(qs):
        try:
            s = qs[name](spark, "/root/testdata/sf0.01").toPandas()
            if name in oracles:
                d = con.execute(oracles[name]).df()
                cols = sorted(s.columns)
                same = (
                    sorted(d.columns) == cols
                    and len(s) == len(d)
                    and s[cols].sort_values(cols, ignore_index=True).astype(str).equals(
                        d[cols].sort_values(cols, ignore_index=True).astype(str)
                    )
                )
                if not same:
                    failures.append(name)
            else:
                again = qs[name](spark, "/root/testdata/sf0.01").toPandas()
                if list(s.columns) != list(again.columns) or len(s) != len(again):
                    failures.append(f"{name} (nondeterministic)")
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name} ERR {str(e)[:80]}")
    print(
        f"[t2] {len(qs)} queries / {len(oracles)} oracles in {time.time()-t0:.0f}s; "
        f"failures: {failures or 'NONE'}"
    )
    spark.stop()

    # 3. bench
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=900,
    )
    last = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    try:
        payload = json.loads(last)
        print(f"[bench] total {payload['value']}s over {len(payload['queries'])} queries")
    except (json.JSONDecodeError, KeyError) as e:
        failures.append(f"bench ({e})")
        print(f"[bench] FAIL: {last[:200]}")

    print("ROUND GATE:", "PASS" if not failures else f"FAIL {failures}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
