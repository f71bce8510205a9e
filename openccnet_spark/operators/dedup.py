"""Deduplication operators for training-data pipelines.

Four families, each a composition of DataFrame ops (shuffle-conscious):

* **Exact** — hash-groupBy on the text (or a normalized form). One shuffle
  on the group key; at 100 TB add a first pass grouping on a 64-bit text
  hash so the shuffle carries 8-byte keys instead of document bodies.
* **MinHash + LSH** — word-shingle -> 64-perm MinHash signature (numpy in
  one ``mapInPandas`` pass) -> banded LSH keys -> bucket self-join for
  candidates -> exact Jaccard verification with array built-ins. Only
  bucket keys + signatures shuffle, never the corpus; bucket size is capped
  to keep pathological buckets from exploding the candidate join.
* **SimHash** — 64-bit signature, near-dup iff Hamming distance <= k on
  band-partitioned prefixes (pigeonhole); same candidate-join shape.
* **Embedding cosine** — see ``similarity.py``; near-dup = cos >= threshold.

All hash functions are crc32-based and deterministic (NEVER Python's
``hash``, which is salted per process).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

JACCARD_THRESHOLD = 0.7
N_PERMS = 63
N_BANDS = 21  # x 3 rows/band; P(miss | j=0.7) ~= 1.5e-4, j=0.83 ~= 2e-8
ROWS_PER_BAND = N_PERMS // N_BANDS
_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 200  # candidate-join guard for degenerate buckets

# fixed permutation parameters from a tiny LCG (seeded, process-independent)
def _perm_params(n: int = N_PERMS) -> tuple[np.ndarray, np.ndarray]:
    state = 0x5EED
    out = []
    for _ in range(2 * n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(state % _MERSENNE or 1)
    arr = np.array(out, dtype=np.uint64)
    return arr[:n], arr[n:]


_PERM_A, _PERM_B = _perm_params()


def shingles_col(text_col, n: int = 3):
    """Distinct word n-gram shingles as an array column (JVM built-ins)."""
    words = F.split(text_col, " ")
    k = F.size(words) - (n - 1)
    # NB: Spark sequence(1, 0) yields a DESCENDING [1, 0] — guard k < 1 or
    # element_at(words, 0) throws INVALID_INDEX_OF_ZERO on short texts.
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: per distinct text, the canonical (min) id + group size.

    At scale, group on a 64-bit prehash first (``F.xxhash64``) so the
    shuffle moves fixed-size keys; verify text equality within groups.
    """
    return (
        df.groupBy(text_col)
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("canonical_id", "n_copies")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-perm MinHash signatures via one Arrow pass (numpy per batch)."""
    out_schema = f"{id_col} long, sig array<long>"
    a, b = _PERM_A, _PERM_B

    def _sign(batches):
        for pdf in batches:
            ids, sigs = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = (text or "").split(" ")
                sh = {
                    " ".join(words[i : i + 3])
                    for i in range(max(len(words) - 2, 0))
                }
                if not sh:
                    sig = np.zeros(N_PERMS, dtype=np.int64)
                else:
                    h = np.array(
                        [zlib.crc32(s.encode("utf-8")) for s in sh], dtype=np.uint64
                    )
                    # (a*h + b) mod p, all perms x all shingles, min per perm
                    vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
                    sig = vals.min(axis=1).astype(np.int64)
                ids.append(did)
                sigs.append(sig.tolist())
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return df.select(id_col, text_col).mapInPandas(_sign, out_schema)


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Banded-LSH candidate pairs (a < b). Shuffles (band_key, id) only."""
    bands = F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(i),
                *[F.element_at("sig", i * ROWS_PER_BAND + j + 1) for j in range(ROWS_PER_BAND)],
            )
            for i in range(N_BANDS)
        ]
    )
    buckets = sig_df.select(
        F.col(id_col), F.explode(bands).alias("band_key")
    )
    # guard: drop degenerate buckets (e.g. empty-text signatures)
    sized = buckets.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    ).filter(F.col("bucket_n") <= MAX_BUCKET)
    a = sized.select(F.col("band_key"), F.col(id_col).alias("a"))
    b = sized.select(F.col("band_key"), F.col(id_col).alias("b"))
    return (
        a.join(b, "band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """MinHash/LSH candidates verified by exact Jaccard on distinct shingles.

    Output: (a, b, jaccard_milli) with a < b and jaccard >= threshold.
    """
    shingled = df.select(
        F.col(id_col), shingles_col(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    pairs = lsh_candidate_pairs(minhash_signatures(df, text_col, id_col), id_col)
    sa = shingled.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select(
            "a", "b", F.floor(F.col("jaccard") * 1000).cast("long").alias("jaccard_milli")
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs WITHOUT LSH (brute-force join).

    The verification baseline for ``minhash_near_duplicates`` and the right
    tool when the corpus-partition is small enough (e.g. per-bucket after a
    coarser partitioner). O(n^2) in rows per partition — at 100 TB use the
    MinHash path and reserve this for candidate verification.
    """
    shingled = df.select(
        F.col(id_col), shingles_col(F.col(text_col)).alias("sh")
    ).filter(F.size("sh") > 0)
    a = shingled.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select(
            "a", "b", F.floor(F.col("jaccard") * 1000).cast("long").alias("jaccard_milli")
        )
    )


def simhash_col(text_col, bits: int = 64):
    """64-bit SimHash over word features, as JVM-side expression.

    Feature hash = xxhash64(word); signature bit i = sign of the sum of
    bit i over features. Deterministic but engine-specific (xxhash64), so
    queries exposing it are rows-only checks.
    """
    words = F.array_distinct(F.split(text_col, " "))
    hashes = F.transform(words, lambda w: F.xxhash64(w))
    # NB: F.lit(1 << 63) overflows Java long in py4j — use shiftleft with a
    # Python-int bit index. The bit mask must be closed over via a factory
    # (an `i=i` default would make pyspark read the lambda as 3-ary).
    def bit_sum(i: int):
        mask = F.shiftleft(F.lit(1).cast("long"), i)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(bit_sum(i) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_near_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dups via pigeonhole banding on 4 x 16-bit prefixes."""
    sh = df.select(F.col(id_col), simhash_col(F.col(text_col)).alias("simhash"))
    bands = F.array(
        *[
            F.concat_ws(
                "_", F.lit(i), F.shiftrightunsigned("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
            )
            for i in range(4)
        ]
    )
    buckets = sh.select(id_col, "simhash", F.explode(bands).alias("band_key"))
    a = buckets.select("band_key", F.col(id_col).alias("a"), F.col("simhash").alias("ha"))
    b = buckets.select("band_key", F.col(id_col).alias("b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, "band_key")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
