"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage:
    python scripts/explain_dump.py <tag> [query ...]

With no query names, dumps every bench HEADLINE query. Writes
``plans/<tag>/<query>_<suffix>.txt`` where suffix comes from
$EXPLAIN_SUFFIX (default "before"). Plan-only — nothing is executed —
so it is safe to run alongside other jobs.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r17"
    names = sys.argv[2:]
    suffix = os.environ.get("EXPLAIN_SUFFIX", "before")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="explain-dump")
    qs = all_queries()
    for name in names:
        try:
            df = qs[name].build(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
