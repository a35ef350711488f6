"""Time named registry queries with the bench methodology (warm pass,
then n timed noop-sink passes; prints min/median/max per query).

Usage:
    python scripts/time_queries.py q1 [q2 ...]
    TIME_PASSES=5 python scripts/time_queries.py q1
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: time_queries.py <query> [query ...]")
        return 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = int(os.environ.get("TIME_PASSES", "3"))

    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import get_spark, release_scratch_caches

    spark = get_spark(app_name="time-queries")
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name].build(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        release_scratch_caches()
        return time.perf_counter() - t0

    for name in names:
        run(name)  # warm
        samples = sorted(run(name) for _ in range(passes))
        print(
            f"{name}: med {statistics.median(samples):.3f} "
            f"min {samples[0]:.3f} max {samples[-1]:.3f}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
