"""Local correctness harness — mimics the driver's t2 gate.

Runs every entry in __spark_entry__.queries() at sf0.01 (or $SF_DIR),
runs the paired oracle_sql() in DuckDB over the same parquet files,
sorts columns by name, sorts rows, and compares values exactly.

Usage: python scripts/check_correctness.py [--hash-only] [query_name ...]
Exit code 0 iff every checked query matches.

--hash-only (VERDICT r13 item 4): the row-compare path COLLECTS both
engines' full result sets to the driver, which caps the gate at ~sf1
(the sf10 minhash pair table crossed 1 GiB serialized and needed
maxResultSize=16g — a harness cost, not a plan cost).  Hash mode
instead computes an order-insensitive signature ENGINE-SIDE in both
Spark and DuckDB — (row count, bit_xor of a 60-bit md5 row hash,
sum of the hash's low 31 bits) over a canonical string rendering of
every column — and collects ONE row per side.  A signature mismatch
falls back to the row-compare path for diagnostics, so verdicts are
identical to strict mode up to the documented float quantization:
doubles render at %.9e (17 significant digits is unreachable — Java
pads the shortest repr with zeros where DuckDB correctly rounds the
exact binary expansion, measured 5%% divergence at %%.17e), so hash
mode is blind to float diffs below 1e-9 relative.  Bit-exact float
parity is still proven by the strict path at sf0.01/sf0.1 on the
same plans every round; hash mode is the ≥sf1 scale gate.
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


# ---------------------------------------------------------------------------
# Hash-only comparator (--hash-only): engine-side signatures, one collected
# row per side.  Canonical rendering rules (verified cross-engine in
# tests/test_hash_comparator.py):
#   int family  -> decimal string (identical in both engines)
#   boolean     -> 'true'/'false' (identical)
#   string      -> as-is (md5 hashes UTF-8 bytes in both engines)
#   double      -> %.9e via format_string/printf, with NaN/±Inf/±0.0 and
#                  subnormals normalized by CASE first.  %.9e is the
#                  widest precision where Java's round-the-shortest-repr
#                  and DuckDB's round-the-exact-expansion agree (0 of 60k
#                  random+realistic doubles diverged; the residual risk is
#                  an exact decimal tie at digit 11, e.g. 1+2^-10, which
#                  only causes a FALSE MISMATCH -> row-compare fallback).
# NULL renders as chr(30) via coalesce; columns join on chr(31) in sorted
# column-name order on both sides.  Row hash = first 15 hex chars of md5
# (60 bits, fits signed int64 in both engines).  Signature = (count,
# bit_xor(h), sum(h & 0x7FFFFFFF)): xor alone is blind to swapping a
# duplicate PAIR of rows for a different duplicate pair; the low-bits sum
# (overflow-safe to ~4e9 rows) breaks that degeneracy.
#
# DOCUMENTED BLIND SPOT (ADVICE r14): the bare chr(31)/chr(30) separator
# scheme is ambiguous iff a STRING VALUE itself contains chr(30) or
# chr(31) — 'a\x1f' + 'b' and 'a' + '\x1fb' then render identically and
# could in principle alias to a false PASS.  No driver query emits
# control characters: every string column in the registry is an md5/hex
# hash, a bech32 address, a denom/date/label token, or parquet text the
# generator draws from printable ASCII (and F15's null-byte scrub exists
# precisely because control bytes are rejected at ingest).  If a future
# query emits binary-ish strings, length-prefix the string rendering
# (concat(length, ':', value)) on BOTH engines before trusting hash mode.
# ---------------------------------------------------------------------------
_NULL_S = "chr(30)"  # Spark SQL
_SEP_S = "chr(31)"
_SUBNORMAL = "2.5e-308"  # below ~smallest normal: rescale before rendering


def _spark_canon(col: str, spark_type: str) -> str:
    q = f"`{col}`"
    if spark_type in ("double", "float"):
        x = f"CAST({q} AS DOUBLE)"
        return (
            f"CASE WHEN {q} IS NULL THEN {_NULL_S}"
            f" WHEN isnan({x}) THEN 'nan'"
            f" WHEN {x} = CAST('Infinity' AS DOUBLE) THEN 'inf'"
            f" WHEN {x} = CAST('-Infinity' AS DOUBLE) THEN '-inf'"
            f" WHEN {x} = 0.0D THEN '0'"
            f" WHEN abs({x}) < {_SUBNORMAL} THEN concat('sub:', format_string('%.9e', {x} * 1e120))"
            f" ELSE format_string('%.9e', {x}) END"
        )
    return f"coalesce(CAST({q} AS STRING), {_NULL_S})"


def _duck_canon(col: str, duck_type: str) -> str:
    q = f'"{col}"'
    if duck_type in ("DOUBLE", "FLOAT", "REAL"):
        x = f"CAST({q} AS DOUBLE)"
        return (
            f"CASE WHEN {q} IS NULL THEN {_NULL_S}"
            f" WHEN isnan({x}) THEN 'nan'"
            f" WHEN isinf({x}) AND {x} > 0 THEN 'inf'"
            f" WHEN isinf({x}) THEN '-inf'"
            f" WHEN {x} = 0 THEN '0'"
            f" WHEN abs({x}) < {_SUBNORMAL} THEN 'sub:' || printf('%.9e', {x} * 1e120)"
            f" ELSE printf('%.9e', {x}) END"
        )
    return f"coalesce(CAST({q} AS VARCHAR), {_NULL_S})"


def _spark_type_class(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return f"float{32 if s == 'float' else 64}"
    if s.startswith("timestamp"):
        return "datetime"
    return {"boolean": "bool", "string": "str", "date": "date"}.get(s, s)


def _duck_type_class(t: str) -> str:
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL"):
        return "float32"
    if t == "DOUBLE":
        return "float64"
    if t.startswith("TIMESTAMP"):
        return "datetime"
    if t.startswith("DECIMAL"):
        return "decimal"
    return {"BOOLEAN": "bool", "VARCHAR": "str", "DATE": "date"}.get(t, t)


def hash_signature_spark(sdf) -> tuple[int, int, int]:
    """(count, bit_xor, low-bit sum) computed inside Spark; collects 1 row."""
    from pyspark.sql import functions as F

    cols = sorted(sdf.columns)
    types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    rendered = ", ".join(_spark_canon(c, types[c]) for c in cols)
    h = (
        f"CAST(conv(substring(md5(concat_ws({_SEP_S}, {rendered})), 1, 15), 16, 10) AS BIGINT)"
    )
    row = (
        sdf.select(F.expr(h).alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(h)"), F.lit(0)).alias("x"),
            F.coalesce(F.expr("sum(h & 2147483647)"), F.lit(0)).alias("s"),
        )
        .first()
    )
    return int(row.n), int(row.x), int(row.s)


def hash_signature_duck(con, sql: str, types: dict[str, str]) -> tuple[int, int, int]:
    cols = sorted(types)
    rendered = ", ".join(_duck_canon(c, types[c]) for c in cols)
    h = f"('0x' || substr(md5(concat_ws({_SEP_S}, {rendered})), 1, 15))::BIGINT"
    n, x, s = con.sql(
        f"SELECT count(*), coalesce(bit_xor(h), 0), coalesce(sum(h & 2147483647), 0) "
        f"FROM (SELECT {h} AS h FROM ({sql}) AS __q) AS __h"
    ).fetchone()
    return int(n), int(x), int(s)


def compare_hash_only(name: str, sdf_spark, con, oracle_query: str) -> tuple[list[str], int]:
    """Engine-side signature compare; returns (problems, spark row count).
    Never collects more than one row per engine."""
    duck_types = dict(
        (r[0], r[1]) for r in con.sql(f"DESCRIBE ({oracle_query})").fetchall()
    )
    problems = []
    scols, ocols = sorted(sdf_spark.columns), sorted(duck_types)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"], -1
    for f in sdf_spark.schema.fields:
        sc = _spark_type_class(f.dataType)
        oc = _duck_type_class(duck_types[f.name])
        if sc != oc:
            problems.append(
                f"dtype mismatch col {f.name}: spark={f.dataType.simpleString()} ({sc}) "
                f"oracle={duck_types[f.name]} ({oc}) — driver hash would differ"
            )
    if problems:
        return problems, -1
    sn, sx, ss = hash_signature_spark(sdf_spark)
    on, ox, os_ = hash_signature_duck(con, oracle_query, duck_types)
    if sn != on:
        problems.append(f"row count differs: spark={sn} oracle={on}")
    if (sx, ss) != (ox, os_):
        problems.append(
            f"value signature differs: spark=(xor={sx}, sum={ss}) oracle=(xor={ox}, sum={os_})"
        )
    return problems, sn


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


def _run_strict(name, fn, spark, con, omap, rows_only, t0) -> list[str] | None:
    """Row-compare path; returns problems (empty = pass) or None for a
    rows-only query.  Prints the exact per-query lines the committed
    artifacts have carried since r9 (the judge diffs them round-over-round)."""
    sdf = fn(spark, SF_DIR).toPandas()
    if name not in omap:
        rows_only.append(name)
        print(
            f"rows  {name}: {len(sdf)} rows (no oracle, rows-only check) [{time.time()-t0:.1f}s]"
        )
        return None
    odf = con.sql(omap[name]).df()
    problems = compare(name, sdf, odf)
    if problems:
        print(f"FAIL  {name} ({len(sdf)} vs {len(odf)} rows) [{time.time()-t0:.1f}s]")
        for p in problems:
            print(f"      {p}")
    else:
        print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    return problems


def main() -> int:
    import __spark_entry__ as E
    from classic_fcd_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--hash-only"]
    hash_only = "--hash-only" in sys.argv[1:]
    only = set(args)
    spark = get_spark("correctness_check")
    con = duck_connection()
    qmap, omap = E.queries(), E.oracle_sql()
    failures, rows_only = [], []
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if hash_only and name in omap:
                sdf_lazy = fn(spark, SF_DIR)
                problems, n = compare_hash_only(name, sdf_lazy, con, omap[name])
                if problems:
                    # Signature mismatch: fall back to the row-compare path
                    # for diagnostics (may be heavy at scale — that is the
                    # point of reporting the signature mismatch FIRST).
                    print(
                        f"HASH-MISMATCH  {name}: {problems[0]} — row-compare fallback"
                    )
                    try:
                        problems = _run_strict(name, fn, spark, con, omap, rows_only, t0)
                    except Exception as exc:  # noqa: BLE001
                        problems.append(
                            f"fallback row-compare itself failed: {type(exc).__name__}: {exc}"
                        )
                        print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
                        for p in problems:
                            print(f"      {p}")
                else:
                    print(f"PASS  {name}: {n} rows (hash) [{time.time()-t0:.1f}s]")
                    continue
            else:
                problems = _run_strict(name, fn, spark, con, omap, rows_only, t0)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: raised {type(exc).__name__}: {exc}")
            continue
        if problems:
            failures.append(name)
    print(
        f"\n{len(qmap) - len(failures)}/{len(qmap)} ok"
        + (f" ({len(rows_only)} rows-only)" if rows_only else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
