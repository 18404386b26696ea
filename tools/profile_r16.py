"""r16 optimization round: focused per-key measurement + plan dumps.

Usage:
  python tools/profile_r16.py KEY [KEY ...]        # noop min-of-2 + plan
  python tools/profile_r16.py --plan-only KEY ...  # just dump the plan
  SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).

Writes plans to plans/r16/<key>_<tag>.txt (tag from --tag, default
'before') and prints one timing line per key. Same protocol as bench.py:
warm JVM, noop sink, min-of-2 (min-of-3 for streaming-runtime keys).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ls_hadoop_3_0_spark as engine  # noqa: E402
from ls_hadoop_3_0_spark.registry import STREAMING_RUNTIME  # noqa: E402
from ls_hadoop_3_0_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLAN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plan_only = "--plan-only" in args
    args = [a for a in args if a != "--plan-only"]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i : i + 2]
    keys = args
    os.makedirs(PLAN_DIR, exist_ok=True)

    spark = get_spark("r16_profile")
    # Warm the JVM + parquet footers once (bench.py's warmup).
    engine.QUERIES["agg_count"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    for key in keys:
        fn = engine.QUERIES[key]
        df = fn(spark, SF_DIR)
        with open(os.path.join(PLAN_DIR, f"{key}_{tag}.txt"), "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            ))
        if plan_only:
            print(f"{key}: plan dumped")
            continue
        runs = []
        n = 3 if key in STREAMING_RUNTIME else 2
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"r16:{key}")
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        print(
            f"{key}: min={min(runs):.3f}s runs="
            + ",".join(f"{r:.3f}" for r in runs)
        )


if __name__ == "__main__":
    main()
