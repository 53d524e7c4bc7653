"""Capture .explain('formatted') for every declared query (plus the
bench-only extras) into plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
  e.g. python scripts/capture_plans.py r15 before

Plans are captured at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) —
the scale the driver benches at.  Explain output is the ANALYZED physical
plan before execution (AdaptiveSparkPlan isFinalPlan=false); that is what
the plan-shape claims in OPTIMIZATION_r*.md reference (Exchange count,
join strategy, PushedFilters, ReadSchema, *EvalPython nodes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--warm"]
    tag = argv[0] if len(argv) > 0 else "r15"
    suffix = argv[1] if len(argv) > 1 else "before"
    only = set(argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import bench
    from classic_fcd_spark.queries import query_fn_map
    from classic_fcd_spark.session import get_spark

    spark = get_spark("capture_plans")
    qmap = dict(query_fn_map())
    qmap.update(bench._extra_workloads())

    # --warm (r16): execute each query once BEFORE explaining a fresh
    # build, so session silvers/memos are populated and the captured
    # plan is the steady-state shape the per-query bench numbers
    # measure (a cold capture inlines every silver-build subtree, so
    # its Exchange count mixes once-per-corpus work into the per-call
    # claim).  Cold remains the default.
    warm = "--warm" in sys.argv
    names = [n for n in qmap if not only or n in only]
    for name in sorted(names):
        try:
            if warm:
                qmap[name](spark, sf_dir).collect()
            df = qmap[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — keep capturing the rest
            text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix}{', warm' if warm else ''})\n")
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
