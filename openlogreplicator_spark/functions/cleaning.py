"""Corpus-cleaning operators: PII redaction, benchmark decontamination,
repetition quality signals.

These are the standard pre-training hygiene passes a 100 TB pipeline runs
between ingest and packing (C4/Gopher/RefinedWeb-style), absent from the
reference (it stops at the change stream) but first-class here:

  * ``redact_pii`` — map-only regexp scrub (email / SSN-shaped / IPv4 /
    phone), whole-stage codegen, zero shuffle at any scale.
  * ``contamination_stats`` — word-shingle overlap of the corpus against
    an eval/benchmark set: shingle-hash equi-join with the (small)
    benchmark side broadcast; cost is one corpus scan + per-doc counts.
  * ``repetition_stats`` — duplicate-n-gram fractions (the Gopher
    repetition filters): explode + two-stage aggregate with map-side
    partial aggregation; no joins.

All patterns are RE2-and-Java-regex compatible and every output is
integer-exact so the DuckDB oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openlogreplicator_spark.functions.dedup import normalize_text

# ordered: SSN before phone (an SSN body also matches the phone shape);
# replacement tokens are digit-free so later passes can't re-match them.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\+?[0-9][0-9\\- ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_<class>... , n_pii): each PII class counted on
    the text as it stands AFTER the previous classes were replaced (so an
    SSN never double-counts as a phone number), then replaced with a
    digit-free token. One projection — no shuffle, no UDF."""
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    out = docs.select(F.col(id_col), cur.alias("clean_text"), *counts)
    total_col = None
    for name, _, _ in PII_PATTERNS:
        t = F.col(f"n_{name}")
        total_col = t if total_col is None else total_col + t
    return out.withColumn("n_pii", total_col.cast("long"))


def _word_ngrams(text_col, n: int):
    """ALL word n-grams (non-distinct) of the normalized text — repetition
    measures need multiplicity, unlike dedup's distinct shingles."""
    toks = F.split(normalize_text(text_col), " ")
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def repetition_stats(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, n_grams, n_distinct, top_gram_count): duplicate-n-gram load per
    document. The Gopher-style filter thresholds (e.g. drop when
    duplicate fraction > 0.2) are downstream arithmetic on these exact
    integers. Two-stage aggregate; both stages combine map-side."""
    grams = docs.select(
        F.col(id_col),
        F.explode(_word_ngrams(F.col(text_col), n)).alias("g"),
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_grams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.max("c").cast("long").alias("top_gram_count"),
    )


def contamination_stats(docs: DataFrame, benchmark: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Benchmark decontamination: (id, n_shingles, n_contaminated) where
    ``n_contaminated`` counts the doc's DISTINCT word n-gram shingles that
    also appear anywhere in ``benchmark`` (id/text-shaped). Downstream
    drops or flags docs whose contaminated fraction exceeds a threshold.

    Scale: both sides reduce to (id, shingle) exploded sets; the
    benchmark (eval suites — MBs, not TBs) is broadcast, so the corpus
    never shuffles: scan -> explode -> broadcast left-semi count."""
    from openlogreplicator_spark.functions.dedup import word_shingles

    d = word_shingles(docs, id_col, text_col, n)
    b = (word_shingles(benchmark, id_col, text_col, n)
         .select("shingle").distinct()
         .withColumn("_hit", F.lit(1)))
    # ONE corpus pass: broadcast left join marks hits, a single groupBy
    # counts both totals and hits (count(col) skips nulls)
    return (
        d.join(F.broadcast(b), "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count("_hit").cast("long").alias("n_contaminated"),
        )
    )
