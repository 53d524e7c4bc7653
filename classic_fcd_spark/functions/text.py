"""Text-analysis column builders for the training-data pipeline extensions.

These are the LLM-pipeline operators the brief adds beyond the reference's
own surface: language-ID (stopword-profile heuristic), quality scoring,
token counting, and document fingerprinting — all as JVM-side Column
expressions (split / filter / regexp / md5), no Python UDFs, so they run
inside whole-stage codegen over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword marker profiles per language (tiny, classic function-word sets).
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "zh": ["的", "是", "了", "在", "我"],
}

EN_STOPWORDS = LANG_PROFILES["en"]

# BPE-ish token pattern: letter runs, digit runs, or single non-space symbol.
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def ws_tokens(text) -> Column:
    """Whitespace tokenization (single pass, no UDF)."""
    return F.split(F.trim(_c(text)), " +")


def n_tokens(text) -> Column:
    return F.size(ws_tokens(text))


def n_regex_tokens(text) -> Column:
    """BPE-ish token count via regexp_extract_all."""
    return F.size(F.regexp_extract_all(F.lower(_c(text)), F.lit(TOKEN_RE), 0))


def stopword_hits(text, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(ws_tokens(text), lambda t: F.array_contains(arr, t)))


def stopword_ratio(text, words: list[str] | None = None) -> Column:
    return stopword_hits(text, words or EN_STOPWORDS).cast("double") / n_tokens(
        text
    ).cast("double")


def mean_token_len(text) -> Column:
    """(non-space chars) / tokens — avoids a per-token transform."""
    t = _c(text)
    return (F.length(F.replace(t, F.lit(" "), F.lit(""))).cast("double")) / n_tokens(
        t
    ).cast("double")


def uniq_token_ratio(text) -> Column:
    return F.size(F.array_distinct(ws_tokens(text))).cast("double") / n_tokens(
        text
    ).cast("double")


def quality_score(text) -> Column:
    """Composite [0,1] quality heuristic: length saturation + lexical
    diversity + non-stopword density.  Deterministic double arithmetic
    (int/int divisions), identical expression tree on the oracle side."""
    length_part = F.least(F.lit(1.0), n_tokens(text).cast("double") / F.lit(50.0))
    diversity = uniq_token_ratio(text)
    density = F.lit(1.0) - stopword_ratio(text)
    return length_part * F.lit(0.4) + diversity * F.lit(0.3) + density * F.lit(0.3)


def fingerprint(text) -> Column:
    """Content fingerprint: md5 over the whitespace-normalized lowercase
    text — the exact-dedup key (deterministic, portable to any engine)."""
    norm = F.lower(F.trim(F.regexp_replace(_c(text), r"\s+", " ")))
    return F.md5(norm)


# ---------------------------------------------------------------------------
# Repetition filters (the MassiveText/Gopher-style quality rules, public:
# Rae et al. 2021 §A1.1) — boilerplate and crawler-loop detection.  Pure
# Column algebra over line/token arrays; no UDFs.
# ---------------------------------------------------------------------------
def lines(text) -> Column:
    return F.split(_c(text), "\n")


def dup_line_fraction(text) -> Column:
    """Fraction of lines that are duplicates of an earlier line:
    1 - distinct/total.  High values flag menu/boilerplate pages."""
    ls = lines(text)
    return (
        F.size(ls) - F.size(F.array_distinct(ls))
    ).cast("double") / F.size(ls)


def top_ngram_fraction(text, n: int = 2) -> Column:
    """Fraction of all tokens covered by occurrences of the single most
    frequent word n-gram — crawler traps repeat one phrase over and over.
    aggregate() over the n-gram array finds the mode count JVM-side."""
    toks = ws_tokens(text)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # mode count = max over distinct grams of occurrence count
    top = F.aggregate(
        F.array_distinct(grams),
        F.lit(0),
        lambda acc, g: F.greatest(acc, F.size(F.filter(grams, lambda x: x == g))),
    )
    return F.when(
        F.size(grams) > 0,
        (top * n).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))


def passes_repetition_filter(
    text, max_dup_line_frac: float = 0.3, max_top_ngram_frac: float = 0.2
) -> Column:
    """The composed keep/drop rule a curation pipeline applies before
    tokenization (thresholds are the published defaults' shape)."""
    return (dup_line_fraction(text) <= max_dup_line_frac) & (
        top_ngram_fraction(text, 2) <= max_top_ngram_frac
    )


# ---------------------------------------------------------------------------
# PII scrubbing (curation-stage redaction).  Patterns stay inside the
# RE2 ∩ Java-regex subset (no lookarounds, no backrefs) so the exact
# same strings run in Spark (Java) and the DuckDB (RE2) test oracle.
# Order matters: emails before phones (the digit run in a mail host must
# not be half-eaten first), IPs before phones (dotted quads look like
# short phone numbers to the phone pattern).
# ---------------------------------------------------------------------------
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d \-()]{7,}\d", "<PHONE>"),
]


def redact_pii(text) -> Column:
    """Text with emails, IPv4 addresses, and phone-like digit runs
    replaced by typed placeholder tokens — chained regexp_replace, pure
    JVM column algebra (Spark replaces globally by default; the DuckDB
    oracle passes the 'g' flag for the same semantics)."""
    out = _c(text)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text) -> Column:
    """Struct of per-type PII match counts (email/ipv4/phone) — the
    audit metric a corpus owner thresholds on before training.  Counting
    runs on the same progressively-redacted text the replacement chain
    sees, so the per-type counts partition the matches exactly like
    redact_pii rewrites them (an IP inside an email, say, is counted
    once, as the email)."""
    out = _c(text)
    fields = []
    for name, pat, token in PII_PATTERNS:
        fields.append(F.regexp_count(out, F.lit(pat)).alias(name))
        out = F.regexp_replace(out, pat, token)
    return F.struct(*fields)


def duck_redact_pii(text_expr: str = "text") -> str:
    """DuckDB expression mirroring redact_pii (same patterns, 'g' flag)."""
    out = text_expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


# ---------------------------------------------------------------------------
# Model-based quality scoring (fasttext-style linear classifier inference).
# The public curation recipes (CCNet, the LLaMA data notes) filter on a
# linear text classifier; inference is just hashed-bag-of-words x weight
# vector + sigmoid, which fits entirely in JVM column algebra: the weight
# vector rides the plan as a broadcast array literal, each token indexes
# it via the md5 hash-bucket, and the mean-pooled logit needs no shuffle
# and no UDF.  Training happens offline; this is the 100 TB-side scorer.
# ---------------------------------------------------------------------------
def hashed_bucket_sql(token_expr: str, n_buckets: int, salt: str = "q") -> str:
    """Engine-portable bucket for a token: first 15 md5 hex digits (60
    bits, exact in a long) mod n_buckets.  Same value in DuckDB via
    CAST(('0x' || substr(md5(...), 1, 15)) AS UBIGINT) % n."""
    return (
        f"CAST(conv(substr(md5('{salt}:' || {token_expr}), 1, 15), 16, 10) AS BIGINT)"
        f" % {n_buckets}"
    )


def linear_quality_logit(text: str, weights: list[float], salt: str = "q") -> Column:
    """Mean-pooled logit of a hashed linear classifier: mean over tokens
    of weights[bucket(token)].  Empty docs score 0 (neutral).  `text`
    must be a column NAME (the token hashing binds the lambda variable
    inside one SQL expression)."""
    if not isinstance(text, str):
        raise ValueError("linear_quality_logit needs a column NAME for SQL embedding")
    toks_sql = f"split(trim({text}), ' +')"
    arr = "array(" + ", ".join(f"CAST({float(w)} AS DOUBLE)" for w in weights) + ")"
    per_tok = F.expr(
        f"transform({toks_sql}, t -> "
        f"element_at({arr}, CAST({hashed_bucket_sql('t', len(weights), salt)} + 1 AS INT)))"
    )
    s = F.aggregate(per_tok, F.lit(0.0), lambda acc, v: acc + v)
    # split('') yields [''] (size 1) in BOTH engines, so the empty-doc
    # guard keys off trimmed length, not token count
    n = F.expr(f"size({toks_sql})")
    nonempty = F.expr(f"length(trim({text})) > 0")
    return F.when(nonempty & (n > 0), s / n).otherwise(F.lit(0.0))


def linear_quality_score(text, weights: list[float], salt: str = "q") -> Column:
    """Sigmoid of the mean-pooled logit — a (0, 1) keep-probability the
    curation threshold compares against."""
    z = linear_quality_logit(text, weights, salt)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def duck_linear_quality_logit(text_expr: str, weights: list[float], salt: str = "q") -> str:
    """DuckDB expression mirroring linear_quality_logit exactly — pure
    rational arithmetic (bucket lookup, sequential sum, one divide), so
    the logit is bit-identical across engines and driver-gateable as a
    floored integer where the sigmoid (exp) is libm-dependent."""
    n = len(weights)
    arr = "[" + ", ".join(f"CAST({float(w)} AS DOUBLE)" for w in weights) + "]"
    toks = f"regexp_split_to_array(trim({text_expr}), ' +')"
    bucket = (
        f"CAST(('0x' || substr(md5('{salt}:' || t), 1, 15)) AS UBIGINT) % {n}"
    )
    per = f"list_transform({toks}, t -> {arr}[CAST({bucket} + 1 AS INT)])"
    return (
        f"(CASE WHEN length(trim({text_expr})) > 0 AND len({toks}) > 0 "
        f"THEN list_sum({per}) / len({toks}) ELSE 0.0 END)"
    )


def duck_linear_quality_score(text_expr: str, weights: list[float], salt: str = "q") -> str:
    """DuckDB expression mirroring linear_quality_score exactly."""
    z = duck_linear_quality_logit(text_expr, weights, salt)
    return f"(1.0 / (1.0 + exp(-({z}))))"


# ---------------------------------------------------------------------------
# URL canonicalization — the dedup key for web corpora (public recipe:
# CC-style pipelines dedup by canonicalized URL before content dedup).
# Pure column algebra in the RE2 ∩ Java regex subset; the DuckDB mirror
# below computes the identical string, so the key is portable.
# Normalizations: drop scheme + fragment, lowercase host, strip leading
# www., strip default :80/:443 ports, strip trailing slash on the path,
# drop tracking params (utm_*, fbclid, gclid, ref), sort surviving query
# params.
# ---------------------------------------------------------------------------
_TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def with_canonical_url(df, url_col: str, out: str = "canonical_url"):
    """df plus a canonicalized-URL column — staged withColumns for
    readability; Catalyst collapses them into one projection, so the
    plan is a single pass over the strings."""
    t = df.withColumn(
        "__u",
        F.regexp_replace(
            F.regexp_replace(F.trim(F.col(url_col)), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),
            r"#.*$",
            "",
        ),
    )
    t = t.withColumn("__hp", F.substring_index("__u", "?", 1))
    t = t.withColumn(
        "__qs",
        F.when(
            F.instr("__u", "?") > 0, F.expr("substr(__u, instr(__u, '?') + 1)")
        ).otherwise(F.lit("")),
    )
    host = F.regexp_replace(
        F.regexp_replace(F.lower(F.substring_index("__hp", "/", 1)), r"^www\.", ""),
        r":(80|443)$",
        "",
    )
    t = t.withColumn("__host", host)
    t = t.withColumn(
        "__path",
        F.when(
            F.instr("__hp", "/") > 0,
            F.regexp_replace(F.expr("substr(__hp, instr(__hp, '/'))"), "/+$", ""),
        ).otherwise(F.lit("")),
    )
    params = F.array_sort(
        F.filter(
            F.split("__qs", "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    t = t.withColumn("__params", params)
    t = t.withColumn(
        out,
        F.concat(
            "__host",
            "__path",
            F.when(
                F.size("__params") > 0,
                F.concat(F.lit("?"), F.concat_ws("&", "__params")),
            ).otherwise(F.lit("")),
        ),
    )
    return t.drop("__u", "__hp", "__qs", "__host", "__path", "__params")


def url_domain(url_col: str) -> Column:
    """Registrable host of a URL: strip scheme/userinfo/port/path, lower,
    drop a leading www. — the grouping key for per-domain corpus stats
    and blocklist filtering (C4 §2.2 filters by domain blocklist; every
    web-corpus recipe aggregates quality signals per domain)."""
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.trim(F.col(url_col)), r"^[A-Za-z][A-Za-z0-9+.-]*://", ""
            ),
            r"^[^/@]*@",  # userinfo
            "",
        ),
        r"[:/?#].*$",  # port, path, query, fragment
        "",
    )
    return F.regexp_replace(F.lower(host), r"^www\.", "")


def filter_blocked_domains(
    df,
    url_col: str,
    blocklist,
    id_col: str = "doc_id",
    subdomains_blocked: bool = True,
):
    """Drop rows whose URL's domain is on the blocklist (or is a
    subdomain of a blocked domain, the C4 behavior).  The blocklist is a
    broadcast join — list sizes are 10^4-10^6 rows, never corpus-shaped
    (literal isin() would compile the whole list into the plan instead).
    Subdomain matching explodes the domain's suffix chain
    (a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com] — bounded, one row per dot level), semi-joins it against the
    broadcast list, and anti-joins the hit IDs back — no regex scan, no
    cross join, keyed on `id_col` throughout."""
    spark = df.sparkSession
    # normalize entries EXACTLY like url_domain normalizes hosts (lower,
    # strip a leading www.) — real blocklists commonly list www hosts,
    # which would otherwise never match; explicit schema so an empty
    # blocklist is the identity filter, not a schema-inference crash
    entries = [(d.lower().removeprefix("www."),) for d in blocklist]
    bl = spark.createDataFrame(entries, "__blocked string")
    dom = url_domain(url_col)
    if not subdomains_blocked:
        return df.withColumn("__dom", dom).join(
            F.broadcast(bl), F.col("__dom") == F.col("__blocked"), "left_anti"
        ).drop("__dom")
    parts = F.split(dom, r"\.")
    n = F.size(parts)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )
    hit = (
        df.select(F.col(id_col), F.explode(suffixes).alias("__cand"))
        .join(F.broadcast(bl), F.col("__cand") == F.col("__blocked"))
        .select(id_col)
        .distinct()
    )
    return df.join(hit, id_col, "left_anti")
