"""Deduplication operators for the training-data pipeline.

All operate on a corpus DataFrame with (id_col, text_col).  Scale notes:
 * exact dedup — one hash-groupBy shuffle on a 128-bit digest; winner per
   group by min(id) so the result is deterministic at any parallelism.
 * MinHash + LSH — shingle -> 64-bit polynomial rolling hash (numpy), n_perm
   permutations via the classic (a*h+b mod p) universal-hash family with a
   FIXED seed table, banded into b bands x r rows; candidate pairs come from
   an equi-join on (band_id, band_hash) — only colliding pairs are compared,
   never O(n^2).  Exact Jaccard verification on candidate pairs is optional.
 * SimHash — 64-bit hyperplane sketch of token multiset; near-dups = equal
   sketches on rotated 16-bit bands (Hamming <= 3 guarantee via 4 bands).
 * n-gram Jaccard — exact pairwise similarity via token-postings join
   (explode n-grams -> equi-join on gram -> count matches / union), with a
   gram-frequency cap to bound skew from stop-grams.

Determinism: every hash is an explicit integer formula (no Python hash()),
so results are identical across workers, runs, and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE_P = (1 << 61) - 1
N_PERM_DEFAULT = 64


def _perm_table(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=n_perm, dtype=np.int64)
    b = rng.randint(0, MERSENNE_P, size=n_perm, dtype=np.int64)
    return a, b


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Representative row per distinct text: (digest, rep_id, n_copies)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("n_copies"))
    )


def shingle_hashes_np(text: str, n: int = 5) -> np.ndarray:
    """Distinct 64-bit polynomial hashes of character n-gram shingles."""
    data = text.encode("utf-8")
    if len(data) < n:
        data = data + b"\x00" * (n - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    h = np.zeros(len(arr) - n + 1, dtype=np.uint64)
    mult = np.uint64(1099511628211)  # FNV prime
    for i in range(n):
        h = h * mult + arr[i : len(arr) - n + 1 + i]
    return np.unique(h)


def minhash_signature_np(text: str, n_perm: int = N_PERM_DEFAULT,
                         shingle_n: int = 5, seed: int = 42) -> np.ndarray:
    a, b = _perm_table(n_perm, seed)
    sh = shingle_hashes_np(text, shingle_n).astype(np.int64)
    if len(sh) == 0:
        return np.zeros(n_perm, dtype=np.int64)
    # (a*h + b) mod p, vectorized over perms x shingles (python ints avoid
    # int64 overflow; n_perm x |shingles| stays small per doc)
    vals = (sh[None, :].astype(object) * a[:, None] + b[:, None]) % MERSENNE_P
    return vals.min(axis=1).astype(np.int64)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_perm: int = N_PERM_DEFAULT, shingle_n: int = 5,
                       seed: int = 42) -> DataFrame:
    @F.pandas_udf(ArrayType(LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: minhash_signature_np(t or "", n_perm, shingle_n, seed).tolist()
        )

    return df.select(F.col(id_col).alias("id"), sig(F.col(text_col)).alias("sig"))


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 16) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs, id_a < id_b, deduped."""
    n_perm = N_PERM_DEFAULT
    rows_per_band = n_perm // bands
    banded = sigs.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band_id", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _fnv1a64(tok: str) -> int:
    """FNV-1a 64-bit hash (public constants), as a Python int < 2^64."""
    h = 14695981039346656037
    for ch in tok.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_np(tokens: list[str], bits: int = 64) -> int:
    """64-bit SimHash over the token multiset, returned as signed int64."""
    if not tokens:
        return 0
    hs = np.array([_fnv1a64(t) for t in tokens], dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    bitm = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = np.where(bitm == 1, 1, -1).sum(axis=0)
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out  # reinterpret signed


def simhash_sketches(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def sk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: simhash_np((t or "").split()))

    return df.select(F.col(id_col).alias("id"), sk(F.col(text_col)).alias("simhash"))


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95,
    round_to: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= threshold).

    Exact all-pairs via a self cross join with JVM-side higher-order
    functions — the oracle-checkable baseline.  At corpus scale, pre-bucket
    with similarity.ann_lsh_topk and verify only candidates; this exact form
    is for the build side / gold sets."""
    from .similarity import _dot, _norm

    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(_dot(F.col("va"), F.col("vb"))
                    / (_norm(F.col("va")) * _norm(F.col("vb"))), round_to),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, min_jaccard: float = 0.5,
                        max_gram_freq: int = 1000) -> DataFrame:
    """Exact word-n-gram Jaccard over posting-list join.

    max_gram_freq drops grams appearing in more than that many docs (stop-gram
    skew cap — at 100TB a single hot gram would otherwise create a quadratic
    join blowup; the cap is the standard postings-pruning trick and only
    affects pairs whose similarity evidence is redundant).
    """
    words = F.split(F.col(text_col), " ")
    n_grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))
    grams = (
        df.select(F.col(id_col).alias("id"), F.explode(n_grams).alias("gram"))
        .distinct()
    )
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    gram_freq = grams.groupBy("gram").agg(F.count("*").alias("df_"))
    pruned = grams.join(
        F.broadcast(gram_freq.filter(F.col("df_") > max_gram_freq)),
        "gram",
        "left_anti",
    )
    a = pruned.alias("a")
    b = pruned.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_grams", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_grams", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "n_inter", "jaccard")
    )
