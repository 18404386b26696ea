"""Ad-hoc runner: ``python -m ls_hadoop_3_0_spark <key> [sf_dir]`` or
``python -m ls_hadoop_3_0_spark sql "<query>" [sf_dir]``.

Lists keys with no args; runs one registered key, or arbitrary SQL
against the fixture tables (registered as views), showing up to 20 rows.
"""

from __future__ import annotations

import sys

from ls_hadoop_3_0_spark import ORACLES, QUERIES
from ls_hadoop_3_0_spark.session import get_spark
from ls_hadoop_3_0_spark.tables import DEFAULT_SF_DIR, register_views


def main(argv: list[str]) -> int:
    if len(argv) < 2 or argv[1] in {"-h", "--help", "list"}:
        print(f"{len(QUERIES)} keys ({len(ORACLES)} oracle-backed):")
        for k in sorted(QUERIES):
            print(f"  {k}{'' if k in ORACLES else '   [rows-only]'}")
        print(f"\nusage: python -m ls_hadoop_3_0_spark <key> [sf_dir={DEFAULT_SF_DIR}]")
        print('       python -m ls_hadoop_3_0_spark sql "<query>" [sf_dir]')
        return 0
    key = argv[1]
    if key == "sql":
        if len(argv) < 3:
            print("usage: python -m ls_hadoop_3_0_spark sql \"<query>\" [sf_dir]", file=sys.stderr)
            return 2
        sf_dir = argv[3] if len(argv) > 3 else DEFAULT_SF_DIR
        spark = get_spark("adhoc_sql")
        register_views(spark, sf_dir)
        df = spark.sql(argv[2])
        df.show(20, truncate=False)
        print(f"rows: {df.count()}")
        return 0
    if key not in QUERIES:
        print(f"unknown key: {key} (run with no args to list)", file=sys.stderr)
        return 2
    sf_dir = argv[2] if len(argv) > 2 else DEFAULT_SF_DIR
    spark = get_spark(f"adhoc_{key}")
    df = QUERIES[key](spark, sf_dir)
    df.show(20, truncate=False)
    print(f"rows: {df.count()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
