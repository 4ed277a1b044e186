"""Full-coverage local mirror of the driver's correctness gate.

The driver's per-round CORRECTNESS_r{N}.json records at most the first 50
queries in name order (observed round 3: 57 registered queries, exactly
the first 50 alphabetical recorded; the text_*/window_* tail was silently
absent). This script runs the IDENTICAL comparison — Spark builder vs
DuckDB oracle at sf0.01, row count + column set + order-insensitive
canonical values — for EVERY registered query and writes
CORRECTNESS_FULL_r{N}.json at the repo root, so the tail queries keep a
per-round verification artifact.

Usage:  python scripts/correctness_full.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES
    from gcp_serverless_etl_pipeline_lab_spark.session import get_session
    from oracle_util import canonical_rows, run_oracle

    spark = get_session(app_name="correctness-full")
    out: dict[str, dict] = {}
    t_all = time.time()
    for name in sorted(QUERIES):
        q = QUERIES[name]
        entry: dict = {}
        t0 = time.time()
        try:
            sdf = q.builder(spark, SF_DIR)
            s_cols = sorted(sdf.columns)
            s_rows = canonical_rows([r.asDict() for r in sdf.collect()], s_cols)
            if q.oracle is None:
                entry.update(rows=len(s_rows), oracle="none (rows-only)")
            else:
                odf = run_oracle(q.oracle, SF_DIR)
                o_cols = sorted(odf.columns)
                o_rows = canonical_rows(odf.to_dict("records"), o_cols)
                entry.update(
                    rows_match=len(s_rows) == len(o_rows),
                    schema_match=s_cols == o_cols,
                    hash_match=s_rows == o_rows,
                    spark_rows=len(s_rows),
                    oracle_rows=len(o_rows),
                    err=None,
                )
        except Exception as exc:  # record, keep going
            entry.update(err=f"{type(exc).__name__}: {exc}"[:300])
        entry["sec"] = round(time.time() - t0, 2)
        out[name] = entry
        ok = entry.get("hash_match", entry.get("rows") is not None)
        print(f"{name}: {'PASS' if ok and not entry.get('err') else 'FAIL'} "
              f"({entry['sec']}s)", flush=True)

    path = os.path.join(ROOT, f"CORRECTNESS_FULL_r{int(rnd):02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    n_bad = sum(
        1 for e in out.values()
        if e.get("err") or e.get("hash_match") is False
        or e.get("rows_match") is False or e.get("schema_match") is False
    )
    print(f"wrote {path}: {len(out)} queries, {n_bad} failing, "
          f"{round(time.time() - t_all, 1)}s total")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
