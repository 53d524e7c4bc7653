"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus job cannot use `rand()`-based sampling: re-runs must
select the SAME rows (resumable pipelines, reproducible ablations), and
per-stratum rates must hold exactly without a shuffle.  Both operators
here hash a stable key instead of drawing randomness — pure projections
(no shuffle, no state), so they run at scan speed on any partitioning
and give bit-identical output on every re-run.

Public technique: hash-mod sampling (e.g. the classic A/B bucketing
pattern); md5 is used for engine portability (same digest in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 hex chars -> 64-bit space; modulus below keeps values exact in a long
_BUCKETS = 1_000_000


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Stable bucket in [0, 1e6): md5 of (salt || key), first 15 hex
    digits (60 bits — conv() stays exact), mod 1e6.  Deterministic
    across engines: DuckDB computes the identical value via
    ``CAST(('0x' || substr(md5(..), 1, 15)) AS UBIGINT) % 1000000``."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BUCKETS).alias(
        "bucket"
    )


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, chosen by key hash — stable under re-runs,
    retries, and repartitioning (rand()-based sampling is none of those).
    """
    threshold = int(rate * _BUCKETS)
    return df.filter(hash_bucket(key, salt) < threshold)


def stratified_sample(
    df: DataFrame, key: str, stratum_col: str, rates: dict[str, float], salt: str = ""
) -> DataFrame:
    """Per-stratum deterministic sampling — the quality-tier downsampling
    step of a training-data mix (e.g. keep 100% of high-quality docs, 10%
    of boilerplate).  Strata absent from ``rates`` are dropped, matching
    the mix-spec-is-exhaustive convention.  Still a pure projection:
    the rate lookup is a literal CASE over the stratum column."""
    thr = F.lit(-1)
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum, int(rate * _BUCKETS)).otherwise(thr)
    return df.filter(hash_bucket(key, salt) < thr)


def duck_hash_bucket(key_expr: str, salt: str = "") -> str:
    """DuckDB expression mirroring hash_bucket for oracle checks."""
    return (
        f"CAST(('0x' || substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 15)) "
        f"AS UBIGINT) % {_BUCKETS}"
    )


def temperature_mix_rates(
    df: DataFrame, stratum_col: str, temperature: float
) -> DataFrame:
    """Per-source sampling rates for a temperature-flattened data mix —
    the MassiveText / Pile recipe: reweight source shares p_s to
    p_s^(1/T) (renormalized), then express the new mix as a per-source
    KEEP RATE against the largest relative upweight so no source needs
    more rows than it has (rate <= 1, the biggest-gainer source keeps
    100%).

    T = 1 reproduces the natural mix (every rate 1.0); T -> inf
    approaches a uniform mix (small sources keep everything, big ones
    are cut to match).  One tiny aggregate (|sources| rows) — the
    actual row selection happens in stratified_sample against these
    rates, still as a pure projection over the corpus."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n"))
    tot = counts.agg(F.sum("n").alias("tot"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        "n",
        F.pow(F.col("n") / F.col("tot"), F.lit(1.0 / temperature)).alias("w"),
    )
    wtot = w.agg(F.sum("w").alias("wtot"))
    # target share q_s = w_s / wtot; required rows = q_s * N_kept.  The
    # binding constraint is the source with max q_s / p_s (it can at
    # most keep rate 1), so rate_s = (q_s / p_s) / max_t(q_t / p_t).
    rel = w.crossJoin(F.broadcast(wtot)).select(
        stratum_col,
        "n",
        ((F.col("w") / F.col("wtot")) / F.col("n")).alias("gain"),  # q_s / (p_s * tot)
    )
    gmax = rel.agg(F.max("gain").alias("gmax"))
    return rel.crossJoin(F.broadcast(gmax)).select(
        stratum_col,
        (F.col("gain") / F.col("gmax")).alias("rate"),
    )


def temperature_mix_sample(
    df: DataFrame,
    key: str,
    stratum_col: str,
    temperature: float,
    salt: str = "",
) -> DataFrame:
    """Deterministically sample df to the temperature-T mix: compute the
    per-source rates, collect the tiny (|sources|-row) rate table, and
    apply stratified_sample — so the corpus-side pass stays a pure
    projection (the collect is bounded by the number of SOURCES, not
    data)."""
    rates = {
        r[stratum_col]: min(1.0, r["rate"])
        for r in temperature_mix_rates(df, stratum_col, temperature).collect()
    }
    return stratified_sample(df, key, stratum_col, rates, salt)


def grouped_reservoir_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Uniform k-per-group sample, deterministic: rank rows inside each
    group by md5(salt||key) and keep the k smallest — the A-Res
    reservoir scheme (Efraimidis & Spirakis, public) with unit weights,
    the hash standing in for the random key.  Eval-set construction
    ("k docs per source for human review") needs exactly this: per-group
    uniformity AND stability under re-runs/retries/repartitioning.

    One window over one (group) partitioning — a single shuffle; groups
    smaller than k come back whole."""
    from pyspark.sql import Window

    c = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(group_col).orderBy(c.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def keep_top_fraction(
    df: DataFrame,
    score_col: str,
    frac: float,
    by_col: str | None = None,
    higher_is_better: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Percentile-threshold gate: keep the best `frac` of rows by
    `score_col`, per `by_col` group (the "top 30% per source by quality
    score" curation step every published mix applies somewhere).

    The threshold is percentile_approx per group — a mergeable sketch
    aggregate over |groups| rows, broadcast back — NEVER a global sort
    or rank window: at 100 TB ranking every row to keep a fraction is
    the anti-pattern this operator exists to replace.  The boundary
    inherits the sketch's rank error (1/accuracy); rows exactly AT the
    threshold are kept, so the kept fraction is >= frac up to ties."""
    q = 1.0 - frac if higher_is_better else frac
    grp = [by_col] if by_col is not None else []
    thresholds = df.groupBy(*grp).agg(
        F.percentile_approx(score_col, F.lit(q), F.lit(accuracy)).alias("__thr")
    )
    joined = (
        df.join(F.broadcast(thresholds), grp)
        if grp
        else df.crossJoin(F.broadcast(thresholds))
    )
    keep = (
        F.col(score_col) >= F.col("__thr")
        if higher_is_better
        else F.col(score_col) <= F.col("__thr")
    )
    return joined.filter(keep).drop("__thr")


def weighted_reservoir_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted k-per-group sample without replacement, deterministic:
    the full A-Res scheme (Efraimidis & Spirakis 2006, public) — each
    row draws u ~ U(0,1) and keeps the k LARGEST u^(1/w), equivalently
    the k smallest -ln(u)/w (the exponential-race form used here, which
    avoids u^tiny underflow for large weights).  Inclusion probability
    is proportional-to-size without replacement; u comes from
    md5(salt||key), so the sample is stable under re-runs, retries, and
    repartitioning — rand() is none of those.

    Rows with weight <= 0, NULL, or NaN never qualify (Spark orders NaN
    greater than every number, so `> 0` alone would admit it).  Same
    single-shuffle
    shape as the uniform form: one window over the group partitioning;
    groups with fewer than k positive-weight rows come back whole."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 15),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 60))
    race = -F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.col("__race").asc(), F.col(key).asc()
    )
    wc = F.col(weight_col)
    return (
        df.filter(wc.isNotNull() & ~F.isnan(wc.cast("double")) & (wc > 0))
        .withColumn("__race", race)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__race", "__rk")
    )
