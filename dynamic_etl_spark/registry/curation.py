"""Corpus-curation queries: benchmark decontamination, PII scrubbing, and
winnowing fingerprints — the train/test-leak, privacy, and partial-dup
gates a training-data pipeline runs after dedup and before packing.

All three are fully oracle-checkable: contamination and winnowing use
md5/engine-neutral gram logic, PII uses the Java-regex ∩ RE2 pattern
subset (ops/pii.py). The documents table carries no real PII, so the PII
fixture is synthesized with the repo's dirty-feed convention — key-modulo
CASE switches reproduced verbatim in the oracle SQL (same trick as
registry/cleaning.py's store/product feeds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import pii as PII
from dynamic_etl_spark.ops.decontam import (
    contamination_profile,
    contamination_profile_bloom,
)
from dynamic_etl_spark.ops.sample import sql_assign_shard, sql_uniform_affine
from dynamic_etl_spark.ops.text import winnow_fingerprints
from dynamic_etl_spark.registry.core import Query, QueryRegistry, t
from dynamic_etl_spark.registry.llm import _SQL_NORM  # shared fingerprint twin
from dynamic_etl_spark.registry.llm import _SQL_TOKENS  # shared tokenizer twin
from dynamic_etl_spark.session import ensure_fanout_parallelism


# ==========================================================================
# Benchmark decontamination (eval set = doc_id % 41 == 0; contamination is
# PLANTED deterministically: every corpus doc with doc_id % 17 == 3 gets an
# 80-char fragment of benchmark doc (doc_id % 13) * 41 appended, so the
# flag fires on a known subset and the oracle can rebuild the same corpus)
# ==========================================================================

def _planted_decontam_inputs(spark: SparkSession, sf_dir: str):
    """(corpus-with-planted-leaks, benchmark) shared by the exact and
    bloom-prefiltered decontamination queries."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    frag = bench.select(
        F.col("doc_id").alias("__bid"),
        F.substring("text", 1, 80).alias("__frag"),
    )
    planted = (
        docs.filter(F.col("doc_id") % 41 != 0)
        .withColumn(
            "__bid",
            F.when(F.col("doc_id") % 17 == 3, (F.col("doc_id") % 13) * 41),
        )
        .join(F.broadcast(frag), "__bid", "left")
        .withColumn(
            "text",
            F.when(
                F.col("__frag").isNotNull(),
                F.concat(F.col("text"), F.lit(" "), F.col("__frag")),
            ).otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )
    return ensure_fanout_parallelism(planted), bench


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, bench = _planted_decontam_inputs(spark, sf_dir)
    return contamination_profile(corpus, bench, k=5, min_shared=5)


def benchmark_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bloom-prefiltered scale path over the SAME planted fixture:
    broadcast a 16 KB bloom of the benchmark grams, prefilter corpus
    grams map-side, exact-verify only bloom survivors
    (ops/decontam.contamination_profile_bloom). Output equals the exact
    path — it shares DECONTAMINATION_ORACLE verbatim."""
    corpus, bench = _planted_decontam_inputs(spark, sf_dir)
    return contamination_profile_bloom(corpus, bench, k=5, min_shared=5)


_SQL_GRAMS_5 = """list_distinct(list_transform(
           range(0, greatest(len(toks) - 5, 0) + 1),
           i -> array_to_string(toks[i + 1 : i + 5], ' ')
         ))"""

DECONTAMINATION_ORACLE = f"""
WITH bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0
),
corpus AS (
  SELECT c.doc_id,
         CASE WHEN b.frag IS NOT NULL THEN c.text || ' ' || b.frag
              ELSE c.text END AS text
  FROM (
    SELECT doc_id, text,
           CASE WHEN doc_id % 17 = 3 THEN (doc_id % 13) * 41 END AS bid
    FROM documents WHERE doc_id % 41 <> 0
  ) c
  LEFT JOIN (SELECT doc_id AS bid, substr(text, 1, 80) AS frag FROM bench) b
  USING (bid)
),
bgrams AS (
  SELECT DISTINCT unnest({_SQL_GRAMS_5}) AS g
  FROM (SELECT {_SQL_TOKENS} AS toks FROM bench)
),
cgrams AS (
  SELECT doc_id, unnest({_SQL_GRAMS_5}) AS g
  FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM corpus)
),
prof AS (
  SELECT c.doc_id,
         count(*) AS n_grams,
         count(b.g) AS n_shared_grams
  FROM cgrams c LEFT JOIN bgrams b USING (g)
  GROUP BY c.doc_id
)
SELECT doc_id, n_grams, n_shared_grams,
       round(CAST(n_shared_grams AS DOUBLE) / n_grams, 6) AS contamination_ratio,
       CAST(n_shared_grams >= 5 AS INT) AS is_contaminated
FROM prof
"""


# ==========================================================================
# PII detect + redact (dirty fixture: every 7th doc gets an email, the
# next residue a phone, the next an IPv4 — all derived from doc_id)
# ==========================================================================

def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    m = F.col("doc_id") % 7
    email = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit("555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit("10."), (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."), ((F.col("doc_id") % 250) + 1).cast("string"),
    )
    dirty = (
        F.when(m == 0, F.concat(F.col("text"), F.lit(" contact "), email))
        .when(m == 1, F.concat(F.col("text"), F.lit(" call "), phone, F.lit(" today")))
        .when(m == 2, F.concat(F.col("text"), F.lit(" host "), ip, F.lit(" up")))
        .otherwise(F.col("text"))
    )
    d = docs.select("doc_id", dirty.alias("text"))
    counts = PII.pii_counts(F.col("text"))
    return d.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ip"].alias("n_ips"),
        PII.has_pii(F.col("text")).alias("has_pii"),
        PII.redact(F.col("text")).alias("redacted"),
    )


PII_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
    CASE doc_id % 7
      WHEN 0 THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com'
      WHEN 1 THEN text || ' call 555-'
                  || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
      WHEN 2 THEN text || ' host 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.0.' || CAST((doc_id % 250) + 1 AS VARCHAR) || ' up'
      ELSE text
    END AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '{PII.EMAIL_RE}')) AS n_emails,
  len(regexp_extract_all(text, '{PII.PHONE_RE}')) AS n_phones,
  len(regexp_extract_all(text, '{PII.IPV4_RE}')) AS n_ips,
  CAST((len(regexp_extract_all(text, '{PII.EMAIL_RE}'))
      + len(regexp_extract_all(text, '{PII.PHONE_RE}'))
      + len(regexp_extract_all(text, '{PII.IPV4_RE}'))) > 0 AS INT) AS has_pii,
  regexp_replace(
    regexp_replace(
      regexp_replace(text, '{PII.EMAIL_RE}', '[EMAIL]', 'g'),
      '{PII.PHONE_RE}', '[PHONE]', 'g'),
    '{PII.IPV4_RE}', '[IP]', 'g') AS redacted
FROM dirty
"""


# ==========================================================================
# Winnowing fingerprints (k=3 word grams, window w=4; md5 hashes so the
# oracle reproduces selections bit-for-bit — see ops/text.py docstring)
# ==========================================================================

def winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_fingerprints(ensure_fanout_parallelism(docs), k=3, w=4)


WINNOWING_ORACLE = f"""
WITH base AS (
  SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
),
seq AS (
  SELECT doc_id,
         list_transform(range(0, greatest(len(toks) - 3, 0) + 1),
                        i -> array_to_string(toks[i + 1 : i + 3], ' ')) AS grams
  FROM base
),
g AS (
  -- parallel unnests zip positionally in DuckDB: pos is 1-based
  SELECT doc_id, len(grams) AS n_grams,
         unnest(range(1, len(grams) + 1)) AS pos,
         unnest(grams) AS gram
  FROM seq
),
m AS (
  SELECT doc_id, n_grams, pos,
         min(md5(gram)) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM g
),
f AS (
  SELECT DISTINCT doc_id, fp FROM m
  WHERE pos <= greatest(n_grams - 4, 0) + 1
)
SELECT doc_id, count(*) AS n_fingerprints,
       md5(string_agg(fp, ',' ORDER BY fp)) AS fp_digest
FROM f
GROUP BY doc_id
"""


# ==========================================================================
# Line-level (CCNet-style) dedup profile. documents.text is single-line,
# so boilerplate lines are PLANTED deterministically (repo dirty-fixture
# convention): doc_id % 4 == 0 gains a newsletter footer, % 4 == 1 a
# copyright footer, and % 6 == 0 a click-bait line — each repeated across
# hundreds of documents, exactly the cross-corpus duplicates the gate
# exists to catch; every base text line stays unique.
# ==========================================================================

_B1 = "subscribe to our newsletter for updates"
_B2 = "all rights reserved copyright notice"
_B3 = "click here to read more"


def line_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.lines import line_dup_profile

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    m4, m6 = F.col("doc_id") % 4, F.col("doc_id") % 6
    dirty = F.concat(
        F.col("text"),
        F.when(m4 == 0, F.lit("\n" + _B1))
        .when(m4 == 1, F.lit("\n" + _B2))
        .otherwise(F.lit("")),
        F.when(m6 == 0, F.lit("\n" + _B3)).otherwise(F.lit("")),
    )
    d = docs.select("doc_id", dirty.alias("text"))
    return line_dup_profile(ensure_fanout_parallelism(d))


LINE_DEDUP_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_B1}'
                 WHEN doc_id % 4 = 1 THEN chr(10) || '{_B2}'
                 ELSE '' END
         || CASE WHEN doc_id % 6 = 0 THEN chr(10) || '{_B3}' ELSE '' END AS text
  FROM documents
),
h AS (
  SELECT doc_id, md5(line) AS lh
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM dirty)
  WHERE line <> ''
),
c AS (SELECT lh, count(DISTINCT doc_id) AS n_docs FROM h GROUP BY lh),
p AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines
  FROM h JOIN c USING (lh)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_lines, 0) AS n_lines,
       COALESCE(n_dup_lines, 0) AS n_dup_lines,
       CASE WHEN COALESCE(n_lines, 0) > 0
            THEN round(CAST(n_dup_lines AS DOUBLE) / n_lines, 6)
            ELSE 0.0 END AS dup_line_frac
FROM documents d LEFT JOIN p USING (doc_id)
"""


# ==========================================================================
# Per-source quota cap: keep each source's top-10 documents by
# (n_chars DESC, doc_id) — a total order, per the repo window rule.
# ==========================================================================

def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.sample import per_key_top_n

    docs = t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return per_key_top_n(
        docs,
        keys=["source"],
        order_by=[F.col("n_chars").desc(), F.col("doc_id")],
        n=10,
        rank_col="src_rank",
    )


QUOTA_ORACLE = """
SELECT doc_id, source, n_chars, src_rank
FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS src_rank
  FROM documents
)
WHERE src_rank <= 10
"""


# ==========================================================================
# Train/validation/test split: 98/1/1 by a hash-uniform of doc_id — the
# standard leakage-safe split (membership is a pure function of the key,
# so re-runs, re-partitions and incremental loads agree forever).
# ==========================================================================

def corpus_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.sample import hash_split, uniform_affine

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    u = uniform_affine("doc_id", salt=71)
    return hash_split(
        docs, u, [("train", 0.98), ("validation", 0.01), ("test", 0.01)]
    ).select("doc_id", "source", "split")


_SQL_U71 = sql_uniform_affine("doc_id", 71)
SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN {_SQL_U71} < 0.98 THEN 'train'
            WHEN {_SQL_U71} < 0.99 THEN 'validation'
            ELSE 'test' END AS split
FROM documents
"""


def leakage_safe_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-holdout 98/1/1 split over a corpus with injected exact
    duplicates (the exact_dedup_fingerprint re-keyed noisy copies, so
    dup groups of size > 1 actually exist): the split coin is flipped on
    the fingerprint group's canonical min-id, never the row id — the
    invariant pytest (test_sampling) asserts no group straddles splits."""
    from dynamic_etl_spark.ops.sample import leakage_safe_split

    docs = t(spark, sf_dir, "documents")
    resent = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper(F.concat(F.lit("  "), F.col("text"), F.lit("  "))).alias("text"),
    )
    feed = docs.select("doc_id", "text").unionByName(resent)
    return leakage_safe_split(
        feed, [("train", 0.98), ("validation", 0.01), ("test", 0.01)], salt=73
    ).select("doc_id", "group_id", "group_size", "split")


_SQL_U73G = sql_uniform_affine("group_id", 73)
LEAKAGE_SAFE_SPLIT_ORACLE = f"""
WITH feed AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, upper('  ' || text || '  ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
g AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5({_SQL_NORM})) AS group_id,
         COUNT(*) OVER (PARTITION BY md5({_SQL_NORM})) AS group_size
  FROM feed
)
SELECT doc_id, group_id, group_size,
       CASE WHEN {_SQL_U73G} < 0.98 THEN 'train'
            WHEN {_SQL_U73G} < 0.99 THEN 'validation'
            ELSE 'test' END AS split
FROM g
"""


# ==========================================================================
# Exact mixture quotas: every even-numbered source contributes exactly 12
# documents, every odd one exactly 5, drawn by deterministic pseudo-random
# rank (uniform + doc_id tiebreak) — probabilistic sampling only hits
# target mixes in expectation; ranked quotas hit them exactly.
# ==========================================================================

def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.sample import per_key_quota_sample, uniform_affine

    docs = t(spark, sf_dir, "documents").select("doc_id", "source")
    src_num = F.substring("source", 4, 10).cast("int")
    quota = F.when(src_num % 2 == 0, F.lit(12)).otherwise(F.lit(5))
    return per_key_quota_sample(
        docs,
        keys=["source"],
        quota=quota,
        uniform=uniform_affine("doc_id", salt=97),
        tiebreak=["doc_id"],
        rank_col="mix_rank",
    )


_SQL_U97 = sql_uniform_affine("doc_id", 97)
MIXTURE_ORACLE = f"""
SELECT doc_id, source, mix_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY {_SQL_U97}, doc_id) AS mix_rank,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 12 ELSE 5 END AS q
  FROM documents
)
WHERE mix_rank <= q
"""




# ==========================================================================
# Shard assignment: the query surface of io.sinks.write_training_shards —
# per-shard row counts + id-range + checksum, oracle-exact (integer
# arithmetic over the SQL-twinned affine uniform). A training loader can
# audit a shard export against this profile without re-reading the data.
# ==========================================================================

def shard_assignment_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.sample import assign_shard

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        docs.withColumn("shard", assign_shard("doc_id", 16, salt=13))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_id").alias("doc_id_sum"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SHARD_ORACLE = f"""
SELECT shard, count(*) AS n_docs,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       CAST(sum(doc_id) AS BIGINT) AS doc_id_sum,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT doc_id, n_chars, {sql_assign_shard("doc_id", 16, 13)} AS shard
  FROM documents
)
GROUP BY shard
"""


def source_concentration_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-style source-domination diagnostic: sources ranked by doc
    count with each one's share and the cumulative share — the number a
    mixture policy reads before capping (how much of the corpus do the
    top-k sources own?). Exact integer counts; shares are single IEEE
    divisions; the rank window total-orders on (count DESC, source) and
    runs over the SOURCE cardinality (bounded, the adjudicated
    mini-dim-window pattern)."""
    docs = t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.orderBy(F.col("n_docs").desc(), F.col("source"))
    cum = Window.orderBy(F.col("n_docs").desc(), F.col("source")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    return counts.select(
        "source",
        "n_docs",
        F.row_number().over(w).cast("long").alias("rank"),
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(total)).alias("share"),
        (
            F.sum("n_docs").over(cum).cast("double") / F.sum("n_docs").over(total)
        ).alias("cum_share"),
    ).orderBy("rank")


CONCENTRATION_ORACLE = """
WITH c AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
)
SELECT source, n_docs,
       CAST(row_number() OVER (ORDER BY n_docs DESC, source) AS BIGINT) AS rank,
       CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS share,
       CAST(SUM(n_docs) OVER (ORDER BY n_docs DESC, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / SUM(n_docs) OVER () AS cum_share
FROM c
ORDER BY rank
"""


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted subsample, 20 docs per language, via A-ES
    weighted sampling without replacement
    (ops/sample.weighted_sample_without_replacement) — weight is the
    doc's character count, so long docs are LIKELY but never guaranteed
    and never repeated. Rows-only (pow is libm); distribution and
    determinism are pytest-checked in tests/test_sample_pack.py."""
    from dynamic_etl_spark.ops.sample import weighted_sample_without_replacement

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample_without_replacement(
        docs, "doc_id", "n_chars", k=20, group_cols=("lang",), salt=7
    ).orderBy("lang", "doc_id")


QUERIES: QueryRegistry = {
    "benchmark_decontamination_bloom": Query(
        benchmark_decontamination_bloom,
        DECONTAMINATION_ORACLE,
        "decontamination scale path: broadcast bloom prefilter + exact verify of survivors",
    ),
    "benchmark_decontamination": Query(
        benchmark_decontamination,
        DECONTAMINATION_ORACLE,
        "n-gram overlap vs a broadcast benchmark gram set; planted leaks flagged",
    ),
    "pii_detect_redact": Query(
        pii_detect_redact,
        PII_ORACLE,
        "regex PII tier counts + redaction over a deterministic dirty fixture",
    ),
    "winnowing_fingerprint": Query(
        winnowing_fingerprint,
        WINNOWING_ORACLE,
        "SIGMOD'03 winnowing: min-hash-per-window fingerprint set per document",
    ),
    "line_dedup_profile": Query(
        line_dedup_profile,
        LINE_DEDUP_ORACLE,
        "CCNet-style duplicated-line profile over planted boilerplate footers",
    ),
    "source_quota_cap": Query(
        source_quota_cap,
        QUOTA_ORACLE,
        "per-source quota: top-10 docs by (n_chars DESC, doc_id) rank-limit window",
    ),
    "corpus_split_assignment": Query(
        corpus_split_assignment,
        SPLIT_ORACLE,
        "deterministic 98/1/1 train/validation/test split by key hash-uniform",
    ),
    "leakage_safe_split": Query(
        leakage_safe_split_assignment,
        LEAKAGE_SAFE_SPLIT_ORACLE,
        "group-holdout split: exact-dup groups share one assignment "
        "(hash of canonical min-id) so duplicates never straddle "
        "train/eval",
    ),
    "corpus_mixture_sample": Query(
        corpus_mixture_sample,
        MIXTURE_ORACLE,
        "exact per-source mixture quotas via deterministic pseudo-random rank",
    ),
    "shard_assignment_profile": Query(
        shard_assignment_profile,
        SHARD_ORACLE,
        "training-shard audit: per-shard rows/range/checksums of the manifest recipe",
    ),
    "source_concentration_profile": Query(
        source_concentration_profile, CONCENTRATION_ORACLE,
        "Lorenz-style source domination: ranked shares + cumulative share",
    ),
    "corpus_weighted_sample": Query(
        corpus_weighted_sample,
        None,
        "A-ES weighted sampling without replacement, k per language "
        "(rows-only: pow is libm; distribution pytest-checked)",
    ),
}
