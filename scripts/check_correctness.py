"""Local correctness harness — mimics the driver's t2 gate.

Runs every entry in __spark_entry__.queries() at sf0.01 (or $SF_DIR),
runs the paired oracle_sql() in DuckDB over the same parquet files,
sorts columns by name, sorts rows, and compares values exactly.

Usage: python scripts/check_correctness.py [query_name ...]
Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _default_duckdb_mem() -> str:
    """Half of detected host RAM, capped at 64GB (ADVICE r11: a
    hardcoded 64GB on a smaller host RAISES the budget above DuckDB's
    safe default and invites an OS OOM kill of the checker — derive it
    instead, and let $DUCKDB_MEM override either way)."""
    try:
        with open("/proc/meminfo") as f:
            kb = int(next(l for l in f if l.startswith("MemTotal")).split()[1])
        return f"{max(2, min(64, kb // (2 * 1024 * 1024)))}GB"
    except (OSError, StopIteration, ValueError):
        return "8GB"


def duck_connection() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Let a heavy oracle spill instead of dying: the checker shares its
    # process with a local[32] Spark JVM, so DuckDB's default 80%-of-RAM
    # budget is a fiction under load (r11: the repetition oracle OOM'd
    # at sf0.1 mid-suite and poisoned the next four oracles' allocations)
    con.sql(
        "SET temp_directory = '"
        + os.environ.get("DUCKDB_SPILL", "/tmp/duckdb_spill")
        + "'"
    )
    # leave the JVM its share of host RAM but keep enough for the
    # heaviest oracles (trigram/decontamination n-gram expansions need
    # > 24 GB of unspillable hash state at sf0.1 — on the 128 GiB
    # bench host the derived default is the old 64GB)
    con.sql(
        "SET memory_limit = '"
        + os.environ.get("DUCKDB_MEM", _default_duckdb_mem())
        + "'"
    )
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _dtype_class(dt) -> str:
    """Collapse a pandas dtype to the class the driver's value-hash can
    distinguish: int sizes render identically ("5"), datetime units render
    identically, but int-vs-float (0 vs 0.0), float32-vs-float64 (precision),
    and bool-vs-object DO render differently and flip the driver's hash."""
    kind = dt.kind if hasattr(dt, "kind") else "O"
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return f"float{dt.itemsize * 8}"
    if kind == "M":
        return "datetime"
    if kind == "b":
        return "bool"
    return str(dt)


def dtype_problems(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Strict pre-coercion dtype check: the driver's value-hash is
    dtype/rendering-sensitive (r4: DuckDB HUGEINT -> float64 0.0 vs Spark
    int64 0 hashed differently while values compared equal).  The loose
    coercing comparator masked exactly that, so local green did not predict
    driver green; this check closes the gap."""
    out = []
    for c in spark_df.columns:
        if c not in oracle_df.columns:
            continue
        sc, oc = _dtype_class(spark_df[c].dtype), _dtype_class(oracle_df[c].dtype)
        if sc != oc:
            out.append(
                f"dtype mismatch col {c}: spark={spark_df[c].dtype} ({sc}) "
                f"oracle={oracle_df[c].dtype} ({oc}) — driver hash would differ"
            )
    return out


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    problems.extend(dtype_problems(spark_df, oracle_df))
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differs: spark={len(spark_df)} oracle={len(oracle_df)}")
    s, o = normalize(spark_df), normalize(oracle_df)
    n = min(len(s), len(o))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not values_equal(s[c].iloc[i], o[c].iloc[i]):
                bad += 1
                if bad <= 5:
                    problems.append(
                        f"row {i} col {c}: spark={s[c].iloc[i]!r} oracle={o[c].iloc[i]!r}"
                    )
                break
    if bad > 5:
        problems.append(f"... {bad} mismatching rows total")
    return problems


def main() -> int:
    import __spark_entry__ as E
    from classic_fcd_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("correctness_check")
    con = duck_connection()
    qmap, omap = E.queries(), E.oracle_sql()
    failures, rows_only = [], []
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            continue
        if name not in omap:
            rows_only.append(name)
            print(f"rows  {name}: {len(sdf)} rows (no oracle, rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(omap[name]).df()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures.append(name)
            print(f"FAIL  {name} ({len(sdf)} vs {len(odf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(
        f"\n{len(qmap) - len(failures)}/{len(qmap)} ok"
        + (f" ({len(rows_only)} rows-only)" if rows_only else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
