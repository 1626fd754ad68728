"""§2.10 LLM-data-pipeline operators (dedup, similarity, text, multimodal, curation).

Mechanically split out of the flat registry.py (r5); behavior and
registration order unchanged — the façade imports families in the
original section order."""
from __future__ import annotations

import os  # noqa: F401

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from .. import aggregates as agg  # noqa: F401
from .. import fixtures as fx  # noqa: F401
from .. import hic  # noqa: F401
from .. import llmops  # noqa: F401
from .. import multimodal  # noqa: F401
from .. import relational as rel  # noqa: F401
from .. import streaming as strm  # noqa: F401
from .. import windows as win  # noqa: F401
from ..io import epoch_us, load_table  # noqa: F401
from ..llmops import dot_double, knuth_hash, l2_norm  # noqa: F401
from ..session import ensure_engine_confs  # noqa: F401
from ._core import (  # noqa: F401
    DIST_HI,
    DIST_LO,
    GOLDEN_ORACLE_KEYS,
    ORACLE_SQL,
    QUERIES,
    _GOLDEN_DIR,
    _golden_oracle,
    register,
)

# ========================================================================
# §2.10 LLM-data-pipeline operators
# ========================================================================



@register(
    "q_dedup_exact",
    oracle="""
SELECT MD5(LOWER(TRIM(text))) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY MD5(LOWER(TRIM(text)))
""",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup keyed on md5(normalized text) — the shuffle carries
    16-byte keys, not documents (100 TB rule)."""
    return llmops.dedup_exact(load_table(spark, sf_dir, "documents"))


@register("q_dedup_near", oracle=_golden_oracle("q_dedup_near"))
def q_dedup_near(spark, sf_dir):
    """MinHash(64) + 16-band LSH candidate pairs with signature-estimated
    Jaccard (shingle→minhash→band→bucket-join).  Band buckets larger
    than LSH_MAX_BUCKET (1000) are dropped from candidate generation
    (round-7 hardening — a mass-duplicated document collides in every
    band, the one residual quadratic in the banded shape; such docs
    belong to the linear q_dedup_exact pass).

    Round-14 plan audit (VERDICT r13 task 8,
    plans/r14/q_dedup_near_after.txt): no duplicated exchange-free
    subtree of the q_minhash_calibration kind — every executed leaf is
    an InMemoryTableScan of the tracked signature/band caches (parquet
    scans appear only inside InMemoryRelation reprints); left alone."""
    return llmops.minhash_lsh_pairs(load_table(spark, sf_dir, "documents"))


@register("q_dedup_simhash", oracle=_golden_oracle("q_dedup_simhash"))
def q_dedup_simhash(spark, sf_dir):
    """SimHash-64 near-dup pairs, EXACT within Hamming radius 3 (the
    standard near-dup radius: 4×16-bit chunk banding + bit_count(xor)
    verification).  Banding is sized to the requested radius — wider
    radii (≤15) cost more candidate pairs; recall gate vs a brute-force
    Hamming self-join: tests/test_llmops.py.  Chunk buckets larger than
    LSH_MAX_BUCKET (1000) are dropped from candidate generation
    (round-7 hardening — mass-duplicated docs share all chunks; they
    belong to the linear q_dedup_exact pass).

    Round-14 plan audit (VERDICT r13 task 8,
    plans/r14/q_dedup_simhash_after.txt): no duplicated exchange-free
    subtree — executed leaves are all cache reads, and Catalyst already
    pushes the Hamming-radius filter INTO the candidate join condition
    (bit_count(xor) <= 3 sits in the BroadcastHashJoin predicate, so
    the distinct never sees over-radius rows); left alone."""
    return llmops.simhash_pairs(
        load_table(spark, sf_dir, "documents"), max_hamming=3
    )


@register(
    "q_dedup_ngram_jaccard",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, source,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM sh a JOIN sh b
    ON a.shingle = b.shingle AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id1, p.id2, CAST(p.common AS BIGINT) AS common,
       CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       ROUND(CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common), 9) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.id1 = s1.doc_id
JOIN sizes s2 ON p.id2 = s2.doc_id
""",
)
def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 3-gram Jaccard over source-blocked pairs: shingle-set
    explode + equi-join on a 64-bit shingle hash (inverted-index shape —
    the pair space never materializes as a cross product; collision
    odds ~n²/2⁶⁵, the DuckDB oracle keeps strings).  The registered
    form is exhaustive; llmops.ngram_jaccard_pairs(max_df=...) is the
    hot-shingle skew lever for 100 TB corpora."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.ngram_jaccard_pairs(d, block_col="source", max_df=None)


@register(
    "q_dedup_ngram_global",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(toks) - 2),
           i -> CONCAT_WS(' ', toks[i], toks[i+1], toks[i+2])
         ))) AS shingle
  FROM toks
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
kept AS (
  SELECT s.doc_id, s.shingle FROM sh s JOIN freq f USING (shingle)
  WHERE f.df <= 50
),
pairs AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS common
  FROM kept a JOIN kept b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.id1, p.id2, CAST(p.common AS BIGINT) AS common,
       CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2,
       ROUND(CAST(p.common AS DOUBLE) / (s1.sz + s2.sz - p.common), 9) AS jaccard
FROM pairs p
JOIN sizes s1 ON p.id1 = s1.doc_id
JOIN sizes s2 ON p.id2 = s2.doc_id
""",
)
def q_dedup_ngram_global(spark, sf_dir):
    """CROSS-source 3-gram Jaccard with the max_df=50 hot-shingle cap —
    the unblocked 100 TB form: without a blocking key, the df cap is
    what keeps a boilerplate shingle shared by 10⁶ docs from generating
    ~10¹² candidate pairs.  Jaccard denominators still use full shingle
    sets (documented containment trade); the blocked exhaustive twin is
    q_dedup_ngram_jaccard."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.ngram_jaccard_pairs(d, block_col=None, max_df=50)


@register(
    "q_dedup_embedding",
    oracle="""
WITH s AS (SELECT label, vec_id, embedding FROM embeddings),
pairs AS (
  SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
         ROUND(
           LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
             i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cosine
  FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT label, id1, id2, cosine FROM pairs WHERE cosine >= 0.25
""",
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs blocked by label (IVF-cell shape:
    equi-join on the block key, no cross product)."""
    e = load_table(spark, sf_dir, "embeddings")
    return llmops.cosine_pairs_blocked_gemm(e, threshold=0.25)


@register(
    "q_sim_topk",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT q.q_id, e.vec_id AS e_id,
         ROUND(
           LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
             i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           / (SQRT(LIST_SUM(LIST_TRANSFORM(q.q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * SQRT(LIST_SUM(LIST_TRANSFORM(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
         6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.q_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, e_id) AS rn
  FROM pairs
)
SELECT q_id, e_id, cosine, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= 5
""",
)
def q_sim_topk(spark, sf_dir):
    """Exact cosine top-k (k=5) per query vector — one Arrow pass over
    the corpus with the driver-collected bounded query side (round 14:
    llmops.cosine_topk_gemm, bit-identical to the brute-force
    broadcast-join spelling it replaced; 4.3× on the 1 M-corpus scale
    row — knn_s 100.96 → 23.54 s — where the n·q pair join paid three
    CodegenFallback folds per pair)."""
    e = load_table(spark, sf_dir, "embeddings")
    return llmops.cosine_topk_gemm(e, e.filter(F.col("vec_id") < 10), k=5)


@register(
    "q_text_stats",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens
FROM t GROUP BY lang
""",
)
def q_text_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
    )


@register(
    "q_token_count",
    oracle="""
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS BIGINT) AS ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(TRIM(text)), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens
FROM documents
""",
)
def q_token_count(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex segmentation."""
    d = load_table(spark, sf_dir, "documents")
    nt = llmops.norm_text("text")
    return d.select(
        "doc_id",
        F.size(F.split(nt, " ")).cast("long").alias("ws_tokens"),
        F.regexp_count(nt, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@register(
    "q_quality_score",
    oracle="""
WITH t AS (
  SELECT doc_id,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(LENGTH(text) AS BIGINT) AS n_chars,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\b(the|a)\\b')) AS BIGINT) AS stop_hits
  FROM documents
)
SELECT doc_id, n_tokens, n_chars, stop_hits,
       ROUND(
         LEAST(1.0, n_tokens / 50.0) * 0.4
         + LEAST(1.0, stop_hits * 5.0 / n_tokens) * 0.3
         + LEAST(1.0, (CAST(n_chars AS DOUBLE) / n_tokens) / 5.0) * 0.3,
       9) AS quality
FROM t
""",
)
def q_quality_score(spark, sf_dir):
    """Heuristic quality scoring: length, stopword ratio, avg token
    length — identical arithmetic on both engines."""
    d = load_table(spark, sf_dir, "documents")
    t = llmops.quality_features(d)
    return t.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        "stop_hits",
        llmops.quality_score_expr().alias("quality"),
    )


@register(
    "q_lang_id",
    oracle="""
WITH c AS (
  SELECT doc_id, lang,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bthe\\b')) AS BIGINT) AS c_the,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bdata\\b')) AS BIGINT) AS c_data,
         CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\bspark\\b')) AS BIGINT) AS c_spark
  FROM documents
)
SELECT doc_id, lang, c_the, c_data, c_spark,
       CASE WHEN c_the >= c_data AND c_the >= c_spark THEN 'en'
            WHEN c_data >= c_spark THEN 'de'
            ELSE 'zh' END AS predicted_lang
FROM c
""",
)
def q_lang_id(spark, sf_dir):
    """Marker-token language-ID heuristic (n-gram scoring shape with a
    deterministic argmax)."""
    d = load_table(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("text"), F.lit(r"\bthe\b")).cast("long").alias("c_the"),
        F.regexp_count(F.col("text"), F.lit(r"\bdata\b")).cast("long").alias("c_data"),
        F.regexp_count(F.col("text"), F.lit(r"\bspark\b")).cast("long").alias("c_spark"),
    )
    return c.withColumn(
        "predicted_lang",
        F.when(
            (F.col("c_the") >= F.col("c_data")) & (F.col("c_the") >= F.col("c_spark")),
            F.lit("en"),
        )
        .when(F.col("c_data") >= F.col("c_spark"), F.lit("de"))
        .otherwise(F.lit("zh")),
    )


@register(
    "q_fingerprint",
    oracle="""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS tok
  FROM documents
),
m AS (
  SELECT doc_id, MIN(MD5(tok)) AS min_tok_sig, COUNT(*) AS n_toks
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, MD5(LOWER(TRIM(d.text))) AS fp_doc, m.min_tok_sig, m.n_toks
FROM documents d JOIN m ON d.doc_id = m.doc_id
""",
)
def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: whole-doc md5 + min token signature
    (winnowing shape)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(llmops.norm_text("text"), " ")).alias("tok")
    )
    m = toks.groupBy("doc_id").agg(
        F.min(F.md5("tok")).alias("min_tok_sig"),
        F.count(F.lit(1)).alias("n_toks"),
    )
    return d.select("doc_id", F.md5(llmops.norm_text("text")).alias("fp_doc")).join(
        m, "doc_id"
    )


@register(
    "q_tfidf_terms",
    oracle="""
WITH toks AS (
  SELECT source, doc_id, UNNEST(STRING_SPLIT(LOWER(TRIM(text)), ' ')) AS term
  FROM documents
),
tf AS (SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY source, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.source, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / dfreq.df), 9) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       tfidf, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 5
""",
)
def q_tfidf_terms(spark, sf_dir):
    """Top tf-idf terms per source: pure relational pipeline (explode →
    two aggregations → broadcast-joined idf → per-group top-k)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    toks = d.select(
        "source", "doc_id", F.explode(F.split(llmops.norm_text("text"), " ")).alias("term")
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "source",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 9
        ).alias("tfidf"),
    )
    return win.topk_per_group(
        scored, ["source"], [F.col("tfidf").desc(), F.col("term")], 5
    )


@register(
    "q_pii_redact",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555' || CAST(doc_id * 7 AS VARCHAR)
              || CAST(1000000 + doc_id AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+')) AS BIGINT) AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9][0-9][0-9][0-9][0-9][0-9]+'))
           AS BIGINT) AS n_long_numbers,
       MD5(REGEXP_REPLACE(REGEXP_REPLACE(text,
           '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+', '<EMAIL>', 'g'),
           '[0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g')) AS redacted_md5
FROM aug
""",
)
def q_pii_redact(spark, sf_dir):
    """PII scrubbing: count + redact email-like and long-digit spans.

    Pure JVM regexp (whole-stage codegen) — no UDF; patterns restricted
    to the Java∩RE2 common subset so the DuckDB oracle matches the
    redacted output byte-for-byte (compared via md5).  The synthetic
    corpus has no PII, so a deterministic pii-ish suffix is appended
    in-query on both engines."""
    d = load_table(spark, sf_dir, "documents")
    email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
    num = "[0-9][0-9][0-9][0-9][0-9][0-9]+"
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call 555"),
            (F.col("doc_id") * 7).cast("string"),
            (F.col("doc_id") + 1_000_000).cast("string"),
        ).alias("text"),
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(email)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(num))
        .cast("long")
        .alias("n_long_numbers"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), email, "<EMAIL>"),
                num,
                "<NUM>",
            )
        ).alias("redacted_md5"),
    )


@register(
    "q_sample_stratified",
    oracle="""
WITH h AS (
  SELECT doc_id, source, lang,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey
  FROM documents
)
SELECT doc_id, source, lang
FROM h WHERE hkey % 100 < 10
""",
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic hash sampling (training-data subsetting): Knuth
    multiplicative hash on the key, mod-bucket keep — reproducible
    across engines and runs, unlike rand()-based sample().  Fully
    pushdown-friendly: the predicate is a pure projection filter."""
    d = load_table(spark, sf_dir, "documents")
    hkey = knuth_hash("doc_id")
    return d.filter(hkey % 100 < 10).select("doc_id", "source", "lang")


@register(
    "q_pack_sequences",
    oracle="""
WITH t AS (
  SELECT source,
         doc_id,
         ((doc_id % 2654435761) * 2654435761) % 4294967296 AS hkey,
         CAST(((doc_id % 2654435761) * 2654435761) % 4294967296 % 16 AS BIGINT) AS shard,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT *,
         SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY hkey, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - n_tokens AS cum_before
  FROM t
)
SELECT source, shard,
       CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM c GROUP BY source, shard, seq_id
""",
)
def q_pack_sequences(spark, sf_dir):
    """Sequence packing (training-batch construction): greedy
    concatenation order cut at 2048-token boundaries, per
    (source, hash-shard) so the running-total window is embarrassingly
    parallel — no global or single-key window at 100 TB; deterministic
    Knuth-hash order; power-of-two target keeps the float division
    bit-exact across engines."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.pack_sequences(
        d, target_tokens=2048, n_shards=16
    ).select("source", "shard", "seq_id", "n_docs", "total_tokens")


@register(
    "q_repetition_filter",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CAST(GREATEST(LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 2, 0) AS BIGINT) AS n_3grams,
         CAST(LEN(LIST_DISTINCT(LIST_TRANSFORM(
           GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 2),
           i -> CONCAT_WS(' ',
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
             STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2])
         ))) AS BIGINT) AS n_distinct
  FROM documents
)
SELECT doc_id, source, n_3grams, n_distinct,
       ROUND(CASE WHEN n_3grams > 0
                  THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_3grams
                  ELSE 0.0 END, 9) AS dup_ratio
FROM t
WHERE CASE WHEN n_3grams > 0
           THEN 1.0 - CAST(n_distinct AS DOUBLE) / n_3grams
           ELSE 0.0 END <= 0.5
""",
)
def q_repetition_filter(spark, sf_dir):
    """Within-document repetition filter (Gopher/RefinedWeb-style
    quality gate): drop documents whose duplicate-3-gram ratio exceeds
    0.5.  Distinct counts come from the ROW-form shingle pipeline
    (posexplode + window lead — whole-stage codegen; the array-lambda
    form runs interpreted per element and measured ~5× slower), one
    doc_id shuffle + partial-final countDistinct; docs too short for a
    3-gram survive via the left join with ratio 0."""
    d = load_table(spark, sf_dir, "documents")
    n3 = F.greatest(
        F.size(F.split(F.lower(F.trim(F.col("text"))), " ")) - 2, F.lit(0)
    ).cast("long")
    base = d.select("doc_id", "source", n3.alias("n_3grams"))
    counts = (
        llmops.shingle_rows(d, k=3, dedup=False)
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_distinct"))
    )
    t = base.join(counts, "doc_id", "left").withColumn(
        "n_distinct", F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long")
    )
    ratio = F.when(
        F.col("n_3grams") > 0,
        1.0 - F.col("n_distinct").cast("double") / F.col("n_3grams"),
    ).otherwise(F.lit(0.0))
    return t.withColumn("dup_ratio", F.round(ratio, 9)).filter(
        ratio <= 0.5
    )


@register(
    "q_ngram_coverage",
    oracle="""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(LOWER(TRIM(text)), ' ') AS t FROM documents
),
bi AS (
  SELECT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(t) - 1),
    i -> CONCAT_WS(' ', t[i], t[i+1]))) AS bg
  FROM toks
),
df AS (SELECT bg, COUNT(DISTINCT doc_id) AS df FROM bi GROUP BY bg),
j AS (
  SELECT b.doc_id, CASE WHEN d.df >= 3 THEN 1 ELSE 0 END AS known
  FROM bi b JOIN df d USING (bg)
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM(known) AS BIGINT) AS n_known,
       ROUND(CAST(SUM(known) AS DOUBLE) / COUNT(*), 9) AS known_frac
FROM j GROUP BY doc_id
""",
)
def q_ngram_coverage(spark, sf_dir):
    """Corpus-vocabulary coverage score (quality/novelty filter): the
    fraction of a document's bigrams that occur in ≥3 corpus documents.
    Integer-exact (counts + one division — no transcendentals, so the
    oracle hash-matches bit-for-bit).  Inverted-index shape: bigram df
    aggregation, equi-join back, per-doc aggregation — two key shuffles,
    never a pair join."""
    d = load_table(spark, sf_dir, "documents")
    bi = llmops.shingle_rows(d, k=2, dedup=False)
    df_counts = bi.groupBy("shingle").agg(
        F.countDistinct("doc_id").alias("df")
    )
    j = bi.join(df_counts, "shingle").select(
        "doc_id", F.when(F.col("df") >= 3, 1).otherwise(0).alias("known")
    )
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("known").cast("long").alias("n_known"),
        F.round(
            F.sum("known").cast("double") / F.count(F.lit(1)), 9
        ).alias("known_frac"),
    )


@register(
    "q_mix_sources",
    oracle="""
WITH c AS (SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source),
m AS (SELECT MIN(n_src) AS min_n FROM c),
r AS (
  SELECT source, SQRT(CAST(min_n AS DOUBLE) / CAST(n_src AS DOUBLE)) AS keep_rate
  FROM c, m
)
SELECT d.doc_id, d.source, d.lang
FROM documents d JOIN r USING (source)
WHERE ((d.doc_id % 2654435761) * 2654435761) % 4294967296 % 1000000
      < CAST(FLOOR(keep_rate * 1000000.0) AS BIGINT)
""",
)
def q_mix_sources(spark, sf_dir):
    """Deterministic source rebalancing (training-mixture construction):
    square-root damping toward uniform via a hash-threshold keep — the
    per-source rate dimension broadcasts, the corpus never shuffles,
    and the kept set is engine-exact (correctly-rounded IEEE ops)."""
    d = load_table(spark, sf_dir, "documents")
    return llmops.mix_sources_balanced(d)


@register(
    "q_contamination",
    oracle="""
WITH probe AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
c_sh AS (
  SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
    GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 4),
    i -> CONCAT_WS(' ',
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+3],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+4])
  ))) AS shingle
  FROM documents
),
p_sh AS (
  SELECT doc_id AS probe_doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
    GENERATE_SERIES(1, LEN(STRING_SPLIT(LOWER(TRIM(text)), ' ')) - 4),
    i -> CONCAT_WS(' ',
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+1],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+2],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+3],
      STRING_SPLIT(LOWER(TRIM(text)), ' ')[i+4])
  ))) AS shingle
  FROM probe
)
SELECT c.doc_id, p.probe_doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM c_sh c JOIN p_sh p USING (shingle)
WHERE c.doc_id <> p.probe_doc_id
GROUP BY c.doc_id, p.probe_doc_id
""",
)
def q_contamination(spark, sf_dir):
    """Benchmark-contamination detection: 5-gram overlap between the
    corpus and a (deterministic) probe set.  The probe side broadcasts —
    the corpus shingle stream never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    return llmops.contamination_pairs(d, probe, k=5)


@register(
    "q_multimodal_meta",
    oracle="""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
       CAST(OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS BIGINT) AS fake_width,
       CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS BIGINT) AS fake_height,
       CAST(OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS BIGINT) AS fake_frames,
       MD5(text) AS checksum
FROM documents
""",
)
def q_multimodal_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload → Arrow mapInPandas
    metadata extraction (decode step stubbed deterministically; schema,
    batching and UDF signature are the real thing)."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_media_meta(multimodal.with_binary_payload(d))


@register(
    "q_multimodal_resize",
    oracle="""
WITH d AS (
  SELECT doc_id,
         OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS w,
         (OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS h
  FROM documents
),
s1 AS (
  SELECT doc_id, w, h,
         CASE WHEN w > 128 THEN 128 ELSE w END AS w1,
         CASE WHEN w > 128 THEN GREATEST(h * 128 // w, 1) ELSE h END AS h1
  FROM d
)
SELECT doc_id,
       CAST(w AS BIGINT) AS src_width,
       CAST(h AS BIGINT) AS src_height,
       CAST(CASE WHEN h1 > 128 THEN GREATEST(w1 * 128 // h1, 1)
                 ELSE w1 END AS BIGINT) AS out_width,
       CAST(CASE WHEN h1 > 128 THEN 128 ELSE h1 END AS BIGINT) AS out_height
FROM s1
""",
)
def q_multimodal_resize(spark, sf_dir):
    """Bounded aspect-preserving resize over binary payloads (decode
    stubbed; integer-only dimension math so the oracle replays it)."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.resize_media(multimodal.with_binary_payload(d))


@register(
    "q_multimodal_frames",
    oracle="""
WITH m AS (
  SELECT doc_id, MD5(text) AS ck,
         OCTET_LENGTH(ENCODE(text)) % 16 + 1 AS frames
  FROM documents
),
f AS (
  SELECT doc_id, ck,
         UNNEST(GENERATE_SERIES(0, frames - 1, 4)) AS frame_idx
  FROM m
)
SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       MD5(ck || '-' || CAST(frame_idx AS VARCHAR)) AS frame_checksum
FROM f
""",
)
def q_multimodal_frames(spark, sf_dir):
    """Every-4th-frame sampling from fake-decoded video payloads — the
    fan-out happens inside the Arrow batch (mapInPandas generator), so
    a 100 TB corpus never routes frame rows through the driver."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_binary_payload(d), stride=4)


def _hex16_sql(i: int) -> str:
    """SQL expression parsing hex chars [4i, 4i+4) of MD5(text) as int."""
    nibbles = [
        f"(STRPOS('0123456789abcdef', SUBSTR(MD5(text), {4 * i + j + 1}, 1)) - 1)"
        for j in range(4)
    ]
    return (
        f"({nibbles[0]} * 4096 + {nibbles[1]} * 256 "
        f"+ {nibbles[2]} * 16 + {nibbles[3]})"
    )


@register(
    "q_multimodal_features",
    oracle="SELECT doc_id, "
    + ", ".join(
        f"CAST({_hex16_sql(i)} AS BIGINT) AS f{i}"
        for i in range(multimodal.FEATURE_DIM)
    )
    + " FROM documents",
)
def q_multimodal_features(spark, sf_dir):
    """Feature-extraction stage (model inference stand-in): fixed-width
    vector per payload via vectorized pandas ops in mapInPandas."""
    d = load_table(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.with_binary_payload(d))
