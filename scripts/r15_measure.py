"""Round-15 optimization measurement harness (guide §1).

Usage: python scripts/r15_measure.py QUERY [QUERY...] [--runs N] [--plan DIR]

For each named query: warm up twice at sf0.001 (JIT/codegen steady state,
same discipline as bench.py), then time `builder + noop write` N times at
$SPARK_GRAFT_SF_DIR (default sf0.1) and report every run plus the min —
the same methodology as bench.py, isolated to one query so plan changes
can be measured without a 15-minute full-suite run.  With --plan DIR the
final DataFrame's explain("formatted") is written to DIR/<query>.txt.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES
from gcp_serverless_etl_pipeline_lab_spark.session import get_session


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    plan_dir = None
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--plan":
            plan_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    spark = get_session(app_name="r15_measure")

    for name in names:
        q = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        for _ in range(2):
            try:
                q.builder(spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # warmup must not mask the timed error
                print(f"{name}: WARMUP FAILED: {e}")
                break
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"timed[{r}]: {name}")
            start = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - start, 3))
        print(f"{name}: min={min(times)}  runs={times}", flush=True)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            df = q.builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())


if __name__ == "__main__":
    main()
