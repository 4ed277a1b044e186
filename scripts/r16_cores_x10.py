"""Round-16 heavies-only core-scaling spot bench (VERDICT r15 item 8).

The sf0.1 bench cannot resolve parallelism — per-query fixed cost
dominates and 8 cores beats 32 (VERDICT r15 "scaling block"). This
runner times the COSTLIEST operators at the x10 stress corpus
(scripts/scale_stress.py's `.scale_data/x10`, generated if missing) on
`local[$SPARK_GRAFT_CPUS]` and records per-op seconds, so two invocations
(SPARK_GRAFT_CPUS=32 and =8) give a real work-bound core-scaling ratio.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/r16_cores_x10.py
    SPARK_GRAFT_CPUS=8  python scripts/r16_cores_x10.py

Each run merges `{"c<cpus>": {op: sec}}` into SCALE_CORES_x10.json; when
both core counts are present, per-op `ratio_8_over_32` is recomputed and
the whole block is mirrored into SCALE_STRESS.json under "cores_x10".
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from gcp_serverless_etl_pipeline_lab_spark.session import (  # noqa: E402
    default_parallelism,
    get_session,
)

# The x10-costliest timed ops from SCALE_STRESS.json — shuffle/compute
# bound, not fixed-cost bound (dedup/graph/LM heavies).
OPS = [
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_resolve",
    "novelty_survivors",
    "dedup_incremental_batch",
    "knn_graph_blocked",
    "bigram_lm_scores",
    "dsir_importance",
    "fuzzy_name_join",
]


def main() -> None:
    import scale_stress

    spark = get_session(app_name="r16_cores_x10")
    cpus = default_parallelism()
    path = scale_stress.generate(spark, 10)
    ops = {k: v for k, v in scale_stress._ops(spark, path).items() if k in OPS}

    # warmup (JIT/codegen) at x1
    x1 = scale_stress.generate(spark, 1)
    for name, build in scale_stress._ops(spark, x1).items():
        if name in OPS:
            try:
                build().write.format("noop").mode("overwrite").save()
            except Exception as exc:
                print(f"warmup {name}: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name, build in ops.items():
        best = None
        for _ in range(2):
            start = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        timings[name] = best
        print(f"c{cpus} x10 {name}: {best}s", file=sys.stderr)

    out_path = os.path.join(REPO, "SCALE_CORES_x10.json")
    data = {}
    if os.path.isfile(out_path):
        with open(out_path) as fh:
            data = json.load(fh)
    data[f"c{cpus}"] = timings
    if "c32" in data and "c8" in data:
        data["ratio_8_over_32"] = {
            k: round(data["c8"][k] / max(data["c32"][k], 1e-9), 2)
            for k in data["c32"]
            if k in data["c8"]
        }
    with open(out_path, "w") as fh:
        json.dump(data, fh, indent=2)
    ss_path = os.path.join(REPO, "SCALE_STRESS.json")
    if os.path.isfile(ss_path):
        with open(ss_path) as fh:
            ss = json.load(fh)
        ss["cores_x10"] = data
        with open(ss_path, "w") as fh:
            json.dump(ss, fh, indent=2)
    print(json.dumps(data))


if __name__ == "__main__":
    main()
