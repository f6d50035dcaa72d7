"""Near-duplicate detection: MinHash + banded LSH, SimHash, n-gram Jaccard
(driver brief: dedup for LLM training data).

100 TB design rule: all-pairs comparison is never materialized. Candidate
generation shuffles on (band_index, band_hash) — two documents meet ONLY
if at least one of their MinHash bands collides, so bucket sizes track
real duplicate clusters, not corpus size. The exact-Jaccard verify runs
per candidate pair. An O(n²) crossJoin appears nowhere.

Signatures are built from ``xxhash64`` with literal seeds — deterministic
across runs, partitions, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.text import normalize_for_fingerprint, tokens


def char_shingles(c: Column, k: int = 5) -> Column:
    """Distinct character k-grams of the normalized text."""
    norm = normalize_for_fingerprint(c)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def word_shingles(c: Column, k: int = 3) -> Column:
    """Distinct word k-grams (n-gram Jaccard's unit)."""
    toks = tokens(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )


def _min_hash(shingles: Column, seed: int) -> Column:
    # NB: the seed must be closed over by a helper, never a lambda default
    # arg — PySpark reads lambda arity, and a 2-arg transform lambda gets
    # the ELEMENT INDEX as its second argument.
    return F.array_min(F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s)))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed i, the minimum xxhash64(i, shingle).
    Pr[sig_a[i] == sig_b[i]] = Jaccard(a, b) — the classic estimator."""
    return F.array(*[_min_hash(shingles, i) for i in range(num_hashes)])


def band_hashes(sig: Column, bands: int, rows: int) -> Column:
    """Collapse each band of ``rows`` signature slots to one 64-bit hash."""
    return F.array(
        *[
            F.xxhash64(F.lit(b), *[sig[b * rows + j] for j in range(rows)])
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Banded-LSH candidate generation.

    Plan: signature (narrow) -> posexplode bands (xB rows) -> self-join on
    (band_index, band_hash) -> distinct (id_a < id_b) pairs. The join
    shuffles on band hash; AQE's skew handling covers pathological
    all-identical corpora. Returns (id_a, id_b).
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col),
        F.posexplode(band_hashes(minhash_signature(F.col(shingle_col), num_hashes), bands, rows))
        .alias("band_idx", "band_hash"),
    )
    left = sig.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    right = sig.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    return (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dup pipeline: word shingles -> MinHash -> banded LSH candidates
    -> exact-Jaccard verify >= threshold. Output (id_a, id_b, jaccard_sim).

    With 32 hashes / 8 bands the LSH S-curve crosses ~0.65 at
    sim=threshold 0.5; callers wanting higher recall raise bands.
    """
    base = docs.select(
        F.col(id_col), word_shingles(F.col(text_col), shingle_k).alias("__sh")
    )
    pairs = lsh_candidate_pairs(base, id_col, "__sh", num_hashes, bands)
    a = base.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    verified = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard_sim", F.round(jaccard(F.col("__sh_a"), F.col("__sh_b")), 6))
        .filter(F.col("jaccard_sim") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard_sim")


def simhash64(c: Column, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens: per bit, sum +1/-1 votes of
    each token's xxhash64; the sign becomes the bit. Near-duplicates land
    within small Hamming distance (use with F.bit_count(a ^ b)).

    Bit positions are Python-loop-unrolled (shift amounts must be
    literals); the whole expression stays in codegen.
    """
    toks = tokens(c)

    def bit_vote(b: int) -> Column:
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        # bit 63 is the sign bit in two's complement
        weight = (1 << b) if b < 63 else -(1 << 63)
        out = out + F.when(bit_vote(b) > 0, F.lit(weight).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def exact_dedup(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup on the md5 content fingerprint: one hash-shuffle
    groupBy, canonical = MIN(id). Output one row per distinct content:
    (fingerprint, canonical_id, dup_count)."""
    from dynamic_etl_spark.ops.text import fingerprint_md5

    return (
        docs.select(F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )
