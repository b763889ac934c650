"""Training-data text operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), language-ID heuristic, quality scoring, token counting,
document fingerprinting.

Design: everything shuffle-bearing is expressed as DataFrame ops on compact
integer/hash keys; Python appears only in vectorized pandas UDFs computing
per-document signatures (Arrow-batched numpy). At 100 TB the LSH band join
is the scale path: candidate pairs come from an equi-join on (band, bucket)
— never a cross join.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MERSENNE = (1 << 61) - 1


_SHINGLE_BASE = np.uint64(1099511628211)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Polynomial hash (mod 2^64) of char k-shingles -> unique uint64 array.
    Vectorized: sliding windows x precomputed base powers, wrap-around
    uint64 arithmetic (identical values to a rolling-hash formulation)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(arr, k).astype(np.uint64)
    with np.errstate(over="ignore"):
        pows = np.empty(k, dtype=np.uint64)
        pows[-1] = 1
        for j in range(k - 2, -1, -1):
            pows[j] = pows[j + 1] * _SHINGLE_BASE
        h = (win * pows[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


@lru_cache(maxsize=None)
def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 7):
    """pandas_udf text -> array<long> MinHash signature."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE - 1, num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE - 1, num_hashes, dtype=np.int64).astype(np.uint64)

    @pandas_udf("array<long>")
    def _sig(text: pd.Series) -> pd.Series:
        # one vectorized pass per Arrow batch: concatenate every document's
        # shingle set, apply all hash functions to the flat array, then
        # segment-min back per document with minimum.reduceat
        shingles = [
            _shingle_hashes(t or "", shingle_k) & np.uint64((1 << 32) - 1)
            for t in text
        ]
        lens = np.array([len(s) for s in shingles], dtype=np.int64)
        flat = np.concatenate(shingles) if shingles else np.empty(0, np.uint64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        sigs = np.empty((len(text), num_hashes), dtype=np.int64)
        for j in range(num_hashes):  # num_hashes rows, each fully vectorized
            vals = (a[j] * flat + b[j]) % np.uint64(MERSENNE)
            sigs[:, j] = np.minimum.reduceat(vals, starts).astype(np.int64)
        return pd.Series(list(sigs))

    return _sig


_BIT_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))[None, :]


def simhash_batch(texts, shingle_k: int = 5) -> np.ndarray:
    """Vectorized SimHash of a batch of texts -> int64[B].

    One flat pass: concatenate all documents' shingle hashes, expand the
    bit matrix once, segment-sum per document with add.reduceat, then pack
    the per-bit majority signs with a single weighted sum — no per-document
    or per-bit Python loops."""
    if len(texts) == 0:
        return np.empty(0, dtype=np.int64)
    shingles = [_shingle_hashes(t or "", shingle_k) for t in texts]
    lens = np.array([len(s) for s in shingles], dtype=np.int64)
    flat = np.concatenate(shingles)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    bits = (
        (flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    ).astype(np.int64)
    counts = np.add.reduceat(bits, starts, axis=0)  # (B, 64)
    score = 2 * counts - lens[:, None]  # sum of (2*bit - 1) per position
    packed = ((score > 0).astype(np.uint64) * _BIT_WEIGHTS).sum(
        axis=1, dtype=np.uint64
    )
    return packed.astype(np.int64)


@lru_cache(maxsize=None)
def make_simhash_udf(shingle_k: int = 5):
    """pandas_udf text -> int64 SimHash (sign of per-bit sums)."""

    @pandas_udf("long")
    def _sim(text: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(list(text), shingle_k))

    return _sim


def fingerprint_expr(text_col) -> "F.Column":
    """64-bit-ish content fingerprint -> int64: first 15 hex chars of the
    md5 digest parsed as an integer (60 bits, always positive). Pure Column
    expression (whole-stage codegen, no Python) with an exact DuckDB twin:
    ``CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.col(text_col).cast("binary") if isinstance(text_col, str)
                          else text_col.cast("binary")), 1, 15),
        16, 10,
    ).cast("long")


def sql_fingerprint(text_col: str) -> str:
    """DuckDB twin of fingerprint_expr (same 60-bit integer)."""
    return f"CAST(('0x' || substr(md5({text_col}), 1, 15)) AS BIGINT)"


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups via content hash (hash-groupBy: map-side
    partial agg, one shuffle on the 128-bit digest)."""
    return (
        docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash + LSH banding: signature -> band buckets -> equi-join on
    (band, bucket) -> estimated-Jaccard filter. No cross join anywhere;
    the band join shuffles on a 64-bit bucket hash (scale path)."""
    rows = num_hashes // bands
    sig = make_minhash_udf(num_hashes, shingle_k)
    with_sig = (
        docs.select(F.col(id_col).alias("doc"), F.col(text_col))
        .withColumn("sig", sig(F.col(text_col)))
        .drop(text_col)
        .cache()  # self-joined below: compute the signature UDF once
    )

    banded = with_sig.select(
        "doc",
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, "
                f"aggregate(slice(sig, b * {rows} + 1, {rows}), CAST(b AS BIGINT), "
                f"(acc, x) -> xxhash64(acc, x)) AS bucket))"  # ANSI-safe fold
            )
        ).alias("bb"),
    ).select("doc", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc1"),
            F.col("r.doc").alias("doc2"),
            F.col("l.sig").alias("sig1"),
            F.col("r.sig").alias("sig2"),
        )
        .dropDuplicates(["doc1", "doc2"])
    )
    est = F.expr(
        "aggregate(zip_with(sig1, sig2, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, v) -> acc + v)"
    ) / F.lit(float(num_hashes))
    return (
        cand.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= jaccard_threshold)
        .select("doc1", "doc2", "est_jaccard")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    block_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup via block permutation: split the 64-bit hash into
    4 x 16-bit blocks; pairs within hamming<=k must share >=1 exact block
    (pigeonhole for k<=3 with 4 blocks; wider k accepted as recall-bounded)
    -> equi-join per block, exact popcount filter."""
    sim = make_simhash_udf()
    d = docs.select(F.col(id_col).alias("doc"), F.col(text_col)).withColumn(
        "simhash", sim(F.col(text_col))
    ).drop(text_col)
    nblocks = 64 // block_bits
    mask = (1 << block_bits) - 1
    blocked = d.select(
        "doc",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {nblocks - 1}), "
                f"b -> struct(b AS blk, "
                f"shiftright(simhash, b * {block_bits}) & {mask} AS val))"
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.blk", "bb.val")
    l, r = blocked.alias("l"), blocked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc1"),
            F.col("r.doc").alias("doc2"),
            F.col("l.simhash").alias("h1"),
            F.col("r.simhash").alias("h2"),
        )
        .dropDuplicates(["doc1", "doc2"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))))
        .where(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    threshold: float = 0.3,
) -> DataFrame:
    """Exact word-set Jaccard within candidate groups (blocked self-join) —
    the exact-verification stage after an LSH prefilter."""
    d = docs.select(
        F.col(id_col).alias("doc"),
        F.col(group_col).alias("grp"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("words"),
    )
    l, r = d.alias("l"), d.alias("r")
    inter = F.size(F.array_intersect(F.col("l.words"), F.col("r.words")))
    uni = (
        F.size(F.col("l.words")) + F.size(F.col("r.words")) - inter
    )
    return (
        l.join(
            r,
            (F.col("l.grp") == F.col("r.grp")) & (F.col("l.doc") < F.col("r.doc")),
        )
        .withColumn("jaccard", inter.cast("double") / uni.cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col("l.doc").alias("doc1"),
            F.col("r.doc").alias("doc2"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "it")


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic + quality scores as pure Column expressions."""
    t = F.col(text_col)
    length = F.length(t).cast("double")
    n_sp = (F.length(t) - F.length(F.regexp_replace(t, " ", ""))).cast("double")
    n_tokens = n_sp + 1.0
    stop_hits = None
    for w in STOPWORDS_EN:
        c = (
            F.length(F.concat(F.lit(" "), t, F.lit(" ")))
            - F.length(F.regexp_replace(F.concat(F.lit(" "), t, F.lit(" ")),
                                        f" {w} ", ""))
        ) / float(len(w) + 2)
        stop_hits = c if stop_hits is None else stop_hits + c
    return (
        docs.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("space_ratio", n_sp / length)
        .withColumn("mean_token_len", (length - n_sp) / n_tokens)
        .withColumn("stopword_ratio", stop_hits / n_tokens)
        .withColumn("lang_pred", F.when(F.col("stopword_ratio") > 0.05, "en")
                    .otherwise("other"))
    )
