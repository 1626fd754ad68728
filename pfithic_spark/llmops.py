"""LLM-training-data pipeline operators (SURVEY.md §2.10 — EXT,
mandated by the north star): deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine), similarity search, and text analysis.

Design for 100 TB:

- Exact dedup groups on a fixed-width hash of the normalized text, not
  the text itself — the shuffle moves 16-byte keys, not documents.
- MinHash/SimHash signatures are computed in Arrow pandas_udf batches
  (deterministic multiply-shift hashing — never Python ``hash()``,
  which is salted per process); LSH banding turns the O(n²) pair space
  into an equi-join on band keys.
- Cosine similarity keeps vectors as arrays end-to-end (zip_with fold;
  no per-dimension explode) and blocks the pair space (label/IVF cell)
  before the cross join; the small query side broadcasts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- normalization / fingerprints ---------------------------------------


def norm_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups keyed by md5(normalized text): keep the
    min id per group.  One hash-agg shuffle on 16-byte keys."""
    return (
        docs.select(F.md5(norm_text(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(text_col), " ")


def shingles_col(text_col: str = "text", k: int = 3) -> Column:
    """k-token shingles as strings (distinct set), built with array
    ops — no explode until the consumer needs rows."""
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)]
        ),
    )
    return F.array_distinct(sh)


# --- MinHash + LSH -------------------------------------------------------

#: 64 deterministic affine hash permutations over a Mersenne prime
_MINHASH_P = (1 << 61) - 1
_MINHASH_N = 64
_rng = np.random.default_rng(0xF17)  # fixed seed → reproducible everywhere
_MINHASH_A = _rng.integers(1, _MINHASH_P, size=_MINHASH_N, dtype=np.int64)
_MINHASH_B = _rng.integers(0, _MINHASH_P, size=_MINHASH_N, dtype=np.int64)


def _stable_hash64(s: str) -> int:
    """Process-stable 64-bit string hash (FNV-1a). Python hash() is
    salted per process and must never cross an executor boundary."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def _minhash_signature_udf():
    # built lazily: pandas_udf construction needs an active SparkSession
    @F.pandas_udf("array<long>")
    def minhash_signature(shingles: pd.Series) -> pd.Series:
        """64-permutation MinHash signature per shingle set (Arrow batch)."""
        out = []
        a = _MINHASH_A.astype(object)
        b = _MINHASH_B.astype(object)
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append([0] * _MINHASH_N)
                continue
            hs = np.array(
                [_stable_hash64(s) & 0x7FFFFFFFFFFFFFFF for s in sh], dtype=object
            )
            # (a*h + b) mod p per permutation; object dtype avoids overflow
            sig = [
                int(((a[i] * hs + b[i]) % _MINHASH_P).min())
                for i in range(_MINHASH_N)
            ]
            out.append(sig)
        return pd.Series(out)

    return minhash_signature


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    est_threshold: float = 0.2,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    rows-per-band = 64/bands; a pair lands in a bucket iff one band of
    the signatures matches exactly.  The pair space becomes an equi-join
    on (band, band-hash) — shuffle keys only, at any corpus size.
    Output: (id1, id2, est_jaccard) with est_jaccard = matching
    signature fraction, filtered to ``est_threshold``.
    """
    rows_per_band = _MINHASH_N // bands
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), shingles_col(text_col).alias("sh")
    ).withColumn("sig", _minhash_signature_udf()(F.col("sh"))).drop("sh")
    sigs = sigs.cache()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            b.cast("string"),
                            F.slice(
                                F.col("sig"), b * rows_per_band + 1, rows_per_band
                            ).cast("array<string>"),
                        )
                    ).alias("bkey"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bkey")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    s1 = sigs.select(F.col("doc_id").alias("id1"), F.col("sig").alias("sig1"))
    s2 = sigs.select(F.col("doc_id").alias("id2"), F.col("sig").alias("sig2"))
    est = F.aggregate(
        F.zip_with(
            F.col("sig1"),
            F.col("sig2"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("double") / F.lit(float(_MINHASH_N))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .select("id1", "id2", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= est_threshold)
    )


# --- SimHash -------------------------------------------------------------


def _simhash64_udf():
    @F.pandas_udf("long")
    def simhash64(tokens: pd.Series) -> pd.Series:
        """64-bit SimHash over token hashes (sign-sum of bit votes)."""
        out = np.empty(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                out[i] = 0
                continue
            votes = np.zeros(64, dtype=np.int64)
            for t in toks:
                h = _stable_hash64(t)
                for bit in range(64):
                    votes[bit] += 1 if (h >> bit) & 1 else -1
            sig = 0
            for bit in range(64):
                if votes[bit] > 0:
                    sig |= 1 << bit
            # store as signed 64-bit
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return simhash64


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 12,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, found by
    banding the 64-bit signature into 4×16-bit chunks (any pair within
    Hamming 3 shares a chunk exactly; wider radii are verified after the
    chunk equi-join prunes the pair space)."""
    sigs = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("toks")
    ).withColumn("sig", _simhash64_udf()(F.col("toks"))).drop("toks")
    sigs = sigs.cache()
    chunk = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(band).alias("band"),
                    F.shiftrightunsigned(F.col("sig"), band * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("ckey"),
                )
                for band in range(4)
            ]
        )
    )
    banded = sigs.select("doc_id", "sig", chunk.alias("c")).select(
        "doc_id", "sig", "c.band", "c.ckey"
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.ckey") == F.col("b.ckey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- cosine similarity ---------------------------------------------------


def dot_double(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns in double precision via a
    sequential zip_with fold — arrays stay intact (no explode)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_double(a, a))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k per query vector: broadcast the small
    query side, cross join, zip_with dot, per-query top-k window.
    The exact baseline; LSH/IVF variants prune the candidate space.
    """
    from pyspark.sql import Window as W

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        )
    )
    e = embeddings.select(F.col(id_col).alias("e_id"), F.col(vec_col).alias("e_vec"))
    cos = dot_double(F.col("q_vec"), F.col("e_vec")) / (
        l2_norm(F.col("q_vec")) * l2_norm(F.col("e_vec"))
    )
    scored = (
        q.join(e, F.col("q_id") != F.col("e_id"))
        .select("q_id", "e_id", F.round(cos, 6).alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("e_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
    )


def cosine_pairs_blocked(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold, blocked by a
    coarse cell (here a label; at scale an IVF centroid assignment) so
    the pair join is an equi-join on the block key, never a full cross
    product."""
    s = embeddings.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    a, b = s.alias("a"), s.alias("b")
    cos = dot_double(F.col("a.vec"), F.col("b.vec")) / (
        l2_norm(F.col("a.vec")) * l2_norm(F.col("b.vec"))
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.blk").alias("label"),
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
