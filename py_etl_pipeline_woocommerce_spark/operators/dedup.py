"""Deduplication family over the ``documents`` table.

- exact (normalized-hash groupBy)
- n-gram Jaccard near-dup (shingle-set overlap, blocked)
- MinHash + LSH banding (the 100 TB path: candidate generation is an
  equi-join on band keys, never an all-pairs comparison)
- SimHash (bitwise fingerprint, banded hamming candidates)

Everything is built from md5-derived hashes expressed as built-in
column functions — deterministic, engine-portable (the DuckDB oracle
computes the same md5 strings), and whole-stage-codegen'd (no Python
in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_hex, norm_text, tokens_expr, word_shingles

SHINGLE_N = 3
MINHASH_PERMS = 16
MINHASH_BANDS = 4  # 4 rows/band; s-curve threshold ≈ (1/4)^(1/4) ≈ 0.71


def _shingle_sets(documents: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-gram shingle array (+ lang block key)."""
    return documents.select(
        "doc_id",
        "lang",
        F.array_distinct(word_shingles(tokens_expr("text"), SHINGLE_N)).alias("shingles"),
    )


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup on the normalized text hash: one row per distinct
    content with the keeper (min doc_id) and the copy count.

    Scale: a single hash-shuffle groupBy on a 32-char key; partial
    aggregation map-side. The keeper choice (min id) is the
    reference-style "first wins" upsert rule.
    """
    return (
        documents.select("doc_id", md5_hex(norm_text("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by word-shingle Jaccard ≥ threshold.

    Candidate blocking: same ``lang`` (a cheap deterministic blocking
    key for the oracle-checked variant; the MinHash/LSH variant below
    is the scalable unblocked path). Jaccard = |∩| / |∪| of distinct
    shingle sets — integer ratio in double, deterministic.
    """
    s = _shingle_sets(documents)
    a = s.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang"),
        F.col("shingles").alias("sh_a"),
    )
    b = s.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = a.join(b, "lang").filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (
        pairs.filter(union > 0)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_signature(documents: DataFrame) -> DataFrame:
    """doc_id + array of MINHASH_PERMS lexicographic-min md5 hex values.

    Permutation i's hash of shingle s is md5(i || '|' || s); the
    signature element is the minimum hex string. Pure column exprs:
    transform over a literal seed sequence, each folding the shingle
    array through array_min.
    """
    s = _shingle_sets(documents).filter(F.size("shingles") > 0)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_PERMS - 1)),
        lambda i: F.array_min(
            F.transform(
                F.col("shingles"),
                lambda sh: F.md5(F.concat(i.cast("string"), F.lit("|"), sh)),
            )
        ),
    )
    return s.select("doc_id", F.col("shingles").alias("shingles"), sig.alias("sig"))


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by true Jaccard.

    Banding: signature split into MINHASH_BANDS contiguous bands;
    docs sharing any band hash become candidates (equi-join on the
    band key — linear-ish, no cross join; THE scalable dedup at
    100 TB). Candidates are then verified with exact Jaccard on the
    shingle sets, so output = true near-dup pairs at recall given by
    the LSH s-curve.
    """
    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    sig = _minhash_signature(documents)
    bands = sig.select(
        "doc_id",
        "shingles",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
                lambda b: F.md5(
                    F.concat_ws(
                        "|",
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_hash", F.col("shingles").alias("sh_a")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_hash", F.col("shingles").alias("sh_b")
    )
    cand = (
        a.join(b, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _simhash_bits(documents: DataFrame, bits: int = 32) -> DataFrame:
    """doc_id + simhash bit array (length ``bits``).

    Token t contributes +1/-1 to bit j according to whether nibble j
    of md5(t) ≥ 8; the fingerprint bit is sign(Σ contributions).
    Token multiplicity counts (standard weighted SimHash).
    """
    toks = tokens_expr("text")
    hashes = F.transform(toks, lambda t: F.md5(t))
    bit_sums = F.transform(
        F.sequence(F.lit(1), F.lit(bits)),
        lambda j: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(
                F.substring(h, 1, 32).substr(j, F.lit(1)).isin(
                    "8", "9", "a", "b", "c", "d", "e", "f"
                ),
                F.lit(1),
            ).otherwise(F.lit(-1)),
        ),
    )
    sim = F.transform(bit_sums, lambda s: (s > 0).cast("int"))
    return documents.select("doc_id", sim.alias("simbits"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3, bits: int = 32) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash) ≤ max_hamming.

    Candidates via band-8 exact-match blocking (any pair within
    hamming 3 of a 32-bit fingerprint shares at least one of 4 8-bit
    bands — pigeonhole), then exact hamming verification. Same
    join-don't-cross-join shape as MinHash LSH.
    """
    n_bands = 4
    band_bits = bits // n_bands
    sim = _simhash_bits(documents, bits)
    bands = sim.select(
        "doc_id",
        "simbits",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.concat_ws(
                    "", F.slice(F.col("simbits"), b * band_bits + 1, band_bits)
                ),
            )
        ).alias("band", "band_key"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "band_key", F.col("simbits").alias("bits_a")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), "band", "band_key", F.col("simbits").alias("bits_b")
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda x, y: (x != y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
