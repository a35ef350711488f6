"""Per-stage attribution for named queries (guide §1.1/§7.1 empirical loop).

Runs each named query once warm then once measured, with the Spark UI
enabled, and diffs the UI REST API's stage list around the measured run:
per-stage executorRunTime, shuffle read/write bytes, task counts — the
"where is the time actually going" table the optimization guide asks for
before any change.

Usage:
    python scripts/profile_query.py <query> [query ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_query.py docs_domain_quota
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.load(r)


def stage_index(spark) -> dict[int, dict]:
    out = {}
    for s in rest(spark, "/stages"):
        # attempts share a stageId; keep the latest attempt
        out[s["stageId"]] = s
    return out


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [query ...]")
        return 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from big_data_chicago_crimes_spark.plans.registry import all_queries
    from big_data_chicago_crimes_spark.session import get_spark, release_scratch_caches

    spark = get_spark(
        app_name="profile-query", extra_conf={"spark.ui.enabled": "true"}
    )
    qs = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = qs[name].build(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        release_scratch_caches()
        return time.perf_counter() - t0

    for name in names:
        run(name)  # warm: JIT, file listing, lake builds
        before = stage_index(spark)
        spark.sparkContext.setJobDescription(name)
        wall = run(name)
        spark.sparkContext.setJobDescription(None)
        after = stage_index(spark)
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        tot_run = sum(s.get("executorRunTime") or 0 for s in new)
        tot_tasks = sum(s.get("numCompleteTasks") or 0 for s in new)
        tot_sr = sum(s.get("shuffleReadBytes") or 0 for s in new)
        tot_sw = sum(s.get("shuffleWriteBytes") or 0 for s in new)
        print(
            f"\n=== {name}: wall {wall:.3f}s | {len(new)} stages, "
            f"{tot_tasks} tasks, executorRunTime {tot_run/1000:.2f}s, "
            f"shuffle R/W {tot_sr/1024:.0f}/{tot_sw/1024:.0f} KiB"
        )
        for s in new[:14]:
            nm = (s.get("name") or "").split("\n")[0][:80]
            print(
                f"  stage {s['stageId']:>4} run {(s.get('executorRunTime') or 0)/1000:6.2f}s"
                f" tasks {s.get('numCompleteTasks', 0):>3}"
                f" in {(s.get('inputBytes') or 0)/1024:7.0f}K"
                f" sr {(s.get('shuffleReadBytes') or 0)/1024:6.0f}K"
                f" sw {(s.get('shuffleWriteBytes') or 0)/1024:6.0f}K  {nm}"
            )
        if os.environ.get("PROFILE_SQL", ""):
            sql_nodes(spark, name)
    return 0


def sql_nodes(spark, label: str) -> None:
    """Print the slowest SQL-plan nodes of the most recent executions."""
    try:
        execs = rest(spark, "/sql?length=200")
    except Exception as exc:  # noqa: BLE001
        print(f"  (sql endpoint unavailable: {exc})")
        return
    execs = [e for e in execs if e.get("status") == "COMPLETED"]
    if not execs:
        return
    ex = max(execs, key=lambda e: e["id"])
    detail = rest(spark, f"/sql/{ex['id']}?details=true&planDescription=false")
    rows = []
    for node in detail.get("nodes", []):
        t_ms = 0.0
        info = []
        for m in node.get("metrics", []):
            mn, mv = m["name"], m.get("value") or ""
            info.append(f"{mn}={mv.split(chr(10))[-1].strip()}")
            if mn.startswith(("time to", "time in", "duration", "op time", "sort time", "aggregate time", "total time")):
                first = mv.split("(")[0].strip()
                mult = {"ms": 0.001, "s": 1.0, "m": 60.0}
                parts = first.split()
                if len(parts) == 2 and parts[1] in mult:
                    try:
                        t_ms = max(t_ms, float(parts[0]) * mult[parts[1]] * 1000)
                    except ValueError:
                        pass
        rows.append((t_ms, node.get("nodeName"), node.get("nodeId"), info))
    rows.sort(key=lambda r: -r[0])
    print(f"  -- SQL nodes (execution {ex['id']}) --")
    for t_ms, nm, nid, info in rows[:18]:
        if t_ms <= 0:
            continue
        short = "; ".join(i for i in info if "total" in i or "rows" in i)[:160]
        print(f"  node {nid:>3} {t_ms/1000:7.2f}s  {nm}  {short}")


if __name__ == "__main__":
    raise SystemExit(main())
