"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the 100 TB story):
- exact: one hash-groupBy shuffle on a 32-char digest — minimal width.
- jaccard/minhash: candidate generation NEVER compares all pairs; pairs
  come from co-occurrence joins (shared shingle / shared LSH bucket), and
  ubiquitous shingles are dropped by a document-frequency cap before the
  self-join — the same reason Halyard decimates oversized inputs
  (tools/.../HalyardBulkLoad.java:444-450): a key shared by everything
  produces a quadratic reducer.
- all hashes are content-derived (md5 / xxhash64 of the shingle text), so
  results are independent of partitioning and cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from halyard_spark.ops.text import tokens


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", by_digest: bool = False
) -> DataFrame:
    """(id, canonical_id): canonical = min id among byte-identical texts.

    Default groups on the VALUE itself — Spark hash-partitions internally
    but compares by value, so hash collisions can never merge distinct
    texts (the reference's collision defense, HBaseSail.java:756-761 /
    HalyardTableUtilsTest.java:81-107).  ``by_digest=True`` shuffles a
    sha256 digest instead — for very wide documents where moving full
    text through the shuffle dominates; collision odds 2^-128.
    """
    key = F.sha2(F.col(text_col).cast("binary"), 256) if by_digest else F.col(text_col)
    hashed = docs.select(F.col(id_col), key.alias("k"))
    canon = hashed.groupBy("k").agg(F.min(id_col).alias("canonical_id"))
    return hashed.join(canon, "k").select(F.col(id_col), "canonical_id")


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    t = tokens(text_col)
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.array_join(F.slice(t, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))


def _pair_candidates(sh: DataFrame, id_col: str, key: str, max_df: int) -> DataFrame:
    """Self-join docs sharing a key, a < b; keys with doc-freq > max_df are
    dropped (no-signal keys would create quadratic pair blowup)."""
    df_ok = sh.groupBy(key).agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_df)
    pruned = sh.join(df_ok.select(key), key)
    a = pruned.select(F.col(key), F.col(id_col).alias("a"))
    b = pruned.select(F.col(key), F.col(id_col).alias("b"))
    return a.join(b, key).where(F.col("a") < F.col("b"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word n-gram shingle sets.

    (a, b, jaccard) for pairs with jaccard >= threshold.  Intersections
    come from the shared-shingle join; unions from per-doc set sizes —
    never a full cross product.
    """
    sh = shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        _pair_candidates(sh, id_col, "shingle", max_df)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2, k: int = 8
) -> DataFrame:
    """k MinHash values per doc: minhash_i = min over shingles of
    md5(i || shingle).  md5 is engine-portable and content-derived, so
    signatures are identical on any cluster size."""
    sh = shingles(docs, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"mh{i}:"), F.col("shingle")).cast("binary"))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    k: int = 8,
    bands: int = 4,
    max_df: int = 200,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding: k hashes split into
    `bands` bands of k/bands rows; docs sharing any full band collide.
    Returns (a, b, n_shared_bands)."""
    r = k // bands
    sig = minhash_signatures(docs, id_col, text_col, n, k)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("|", *[F.col(f"mh{bi * r + j}") for j in range(r)]).alias("key"),
        )
        for bi in range(bands)
    ]
    buckets = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")
    ).select(id_col, F.concat_ws("#", F.col("bk.band").cast("string"), F.col("bk.key")).alias("bucket"))
    return (
        _pair_candidates(buckets, id_col, "bucket", max_df)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over tokens (xxhash64 token hashes, sign-summed per
    bit).  Bit arithmetic stays entirely in the JVM: the per-bit
    contributions are 64 generated sum expressions, not per-row Python."""
    tok = docs.select(F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"s{i}")
        for i in range(64)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sim = None
    for i in range(64):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim.bitwiseXOR(term)  # disjoint bits: xor == or
    return sums.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_df: int = 200,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.  Candidates
    via 4x16-bit chunk banding (pigeonhole: <=3 differing bits leave at
    least one 16-bit chunk identical), verified with bit_count(xor)."""
    sig = simhash64(docs, id_col, text_col)
    chunks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "#",
                        F.lit(i).cast("string"),
                        F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF)).cast("string"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bucket"),
    )
    a = chunks.select(F.col("bucket"), F.col(id_col).alias("a"), F.col("simhash").alias("sim_a"))
    b = chunks.select(F.col("bucket"), F.col(id_col).alias("b"), F.col("simhash").alias("sim_b"))
    df_ok = chunks.groupBy("bucket").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_df)
    a = a.join(df_ok.select("bucket"), "bucket")
    cand = a.join(b, "bucket").where(F.col("a") < F.col("b")).select("a", "b", "sim_a", "sim_b").distinct()
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
