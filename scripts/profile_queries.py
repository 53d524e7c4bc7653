"""Per-query profiler: for each declared/bench query at $SPARK_GRAFT_SF_DIR,
run twice (cold incl. corpus persists, then steady-state) and record
wall seconds plus how many Spark JOBS and STAGES the steady-state run
issued (statusTracker delta).  High job counts expose eager driver
probes / collects; high stage counts expose shuffle-heavy plans.

Usage: python scripts/profile_queries.py [query ...]   (default: bench HEADLINE)
Prints one JSON line per query plus a sorted summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench
    from classic_fcd_spark.queries import query_fn_map
    from classic_fcd_spark.session import get_spark

    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qmap = dict(query_fn_map())
    qmap.update(bench._extra_workloads())
    names = sys.argv[1:] or [n for n in bench.HEADLINE if n in qmap]

    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        try:
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).collect()
            cold = time.perf_counter() - t0

            jobs_before = set(tracker.getJobIdsForGroup(None))
            stage_before = max([-1] + [s for j in jobs_before for s in (tracker.getJobInfo(j).stageIds if tracker.getJobInfo(j) else [])])
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).collect()
            warm = time.perf_counter() - t0
            jobs_after = set(tracker.getJobIdsForGroup(None))
            new_jobs = jobs_after - jobs_before
            n_stages = 0
            for j in new_jobs:
                info = tracker.getJobInfo(j)
                if info:
                    n_stages += len(info.stageIds)
            row = {
                "q": name,
                "cold_s": round(cold, 3),
                "warm_s": round(warm, 3),
                "jobs": len(new_jobs),
                "stages": n_stages,
            }
        except Exception as exc:  # noqa: BLE001
            row = {"q": name, "err": f"{type(exc).__name__}: {exc}"[:200]}
        finally:
            sc.setJobDescription(None)
        rows.append(row)
        print(json.dumps(row), flush=True)

    ok = [r for r in rows if "warm_s" in r]
    ok.sort(key=lambda r: -r["warm_s"])
    print("\n== slowest steady-state ==")
    for r in ok[:20]:
        print(f"{r['q']:<32} warm={r['warm_s']:>7.3f}s cold={r['cold_s']:>7.3f}s jobs={r['jobs']:>3} stages={r['stages']:>3}")


if __name__ == "__main__":
    main()
