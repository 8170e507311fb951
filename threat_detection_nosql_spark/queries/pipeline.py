"""LLM-data-pipeline operators over `documents` / `embeddings`
(BASELINE.json north star; SURVEY.md §7 step 8).

Oracle-checked here: exact dedup, n-gram Jaccard similarity, token/
quality stats, language-ID heuristic, brute-force cosine top-k,
multimodal binary metadata. The hash-seeded ops (MinHash LSH, SimHash)
live in ``operators/dedup.py`` and are registered rows-only (Spark and
DuckDB disagree on hash functions by construction).

Scale notes: the Jaccard join is shingle-partitioned — candidate pairs
are generated only for docs sharing a shingle, never all-pairs; the
cosine top-k broadcasts the (tiny) query set and never shuffles the
corpus; both are the patterns that survive 100 TB, with LSH variants as
the subquadratic path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from threat_detection_nosql_spark.sources.readers import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "is", "in", "it")


# -- D1: exact deduplication (hash-groupBy) ----------------------------------

def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup: md5(text) → group → representative = min
    doc_id (the keep), n_copies. One shuffle on the 128-bit hash, never
    on the full text — the only formulation that works when `text` is
    megabytes."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .select(F.md5("text").alias("text_hash"), "doc_id")
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_copies")))


_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash,
       min(doc_id) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY md5(text)
"""


# -- D2: n-gram Jaccard near-dup, top-20 most similar pairs ------------------

def _shingles(docs: DataFrame) -> DataFrame:
    """Distinct word-3-gram shingles per doc — array ops, no UDF."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(docs)
    w = F.split(F.col("text"), r"\s+")
    # 3-grams via zip_with over shifted slices: lambda bodies reference
    # only lambda variables, so the split runs O(k) times per row — an
    # element_at-inside-transform lambda would get `w` inlined by
    # CollapseProject and re-split the text once per element access.
    # Docs with <3 words must be filtered (slice length must be ≥ 0,
    # and DuckDB's range() is empty there).
    n_sh = F.greatest(F.size(w) - 2, F.lit(0))
    grams = F.zip_with(
        F.zip_with(F.slice(w, 1, n_sh), F.slice(w, 2, n_sh),
                   lambda a, b: F.concat_ws(" ", a, b)),
        F.slice(w, 3, n_sh), lambda ab, c: F.concat_ws(" ", ab, c))
    return (docs
            .filter(F.size(w) >= 3)
            .select("doc_id", F.explode(grams).alias("shingle"))
            .distinct())


def ngram_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard over 3-gram shingle sets: shingle-equi-join generates
    candidates (only docs sharing ≥1 shingle), intersection counts per
    pair, |union| = |A|+|B|−|∩|. Top-20 pairs by similarity."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .select("doc_a", "doc_b",
                    F.round(F.col("n_inter")
                            / (F.col("n_a") + F.col("n_b")
                               - F.col("n_inter")), 6).alias("jaccard"))
            .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
            .limit(20))


_JACCARD_SQL = r"""
WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wds
           FROM documents),
sh AS (SELECT DISTINCT doc_id, wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2]
                AS shingle
       FROM w, LATERAL (SELECT unnest(range(1, len(wds) - 1)) AS i) ix),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       round(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
ORDER BY jaccard DESC, doc_a ASC, doc_b ASC
LIMIT 20
"""


# -- D3: token counting + quality scoring ------------------------------------

def doc_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text-quality features: token count (whitespace), char
    count, punctuation count, stopword ratio, mean word length — all
    built-in string/array expressions (codegen, no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), r"\s+")
    n_tok = F.size(tokens)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(
        f"size(filter(split(text, '\\\\s+'), t -> t in ({stop_list})))")
    n_punct = (F.length("text")
               - F.length(F.regexp_replace("text", r"[.,!?;:]", "")))
    n_nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        n_punct.alias("n_punct"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(n_nonspace / n_tok, 6).alias("mean_word_len"))


_QUALITY_SQL = r"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_actual,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
            AS INT) AS n_punct,
       round(len(list_filter(string_split_regex(text, '\s+'),
                             t -> t IN ('the','a','of','and','to','is','in','it')))
             * 1.0 / len(string_split_regex(text, '\s+')), 6) AS stopword_ratio,
       round(length(regexp_replace(text, '\s', '', 'g'))
             * 1.0 / len(string_split_regex(text, '\s+')), 6) AS mean_word_len
FROM documents
"""


# -- D4: language-ID heuristic ------------------------------------------------

def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-frequency language ID, reduced to a deterministic marker
    heuristic (English function-word hits vs the labeled lang). Counts
    occurrences of ' the ' / ' and ' / ' of ' as en-markers; exact
    integer arithmetic so the oracle matches bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))

    def occurrences(marker: str):
        return ((F.length(padded)
                 - F.length(F.regexp_replace(padded, marker, "")))
                / len(marker)).cast("int")

    en_score = (occurrences(" the ") + occurrences(" and ")
                + occurrences(" of "))
    return docs.select(
        "doc_id", "lang",
        en_score.alias("en_marker_hits"),
        F.when(en_score > 0, F.lit("en")).otherwise(F.lit("und"))
         .alias("predicted_lang"))


_LANG_ID_SQL = """
WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS pt FROM documents),
s AS (SELECT doc_id, lang,
             CAST((length(pt) - length(replace(pt, ' the ', ''))) / 5
                  + (length(pt) - length(replace(pt, ' and ', ''))) / 5
                  + (length(pt) - length(replace(pt, ' of ', ''))) / 4
                  AS INT) AS en_marker_hits
      FROM p)
SELECT doc_id, lang, en_marker_hits,
       CASE WHEN en_marker_hits > 0 THEN 'en' ELSE 'und' END AS predicted_lang
FROM s
"""


# -- D5: brute-force cosine top-k (ANN baseline) -----------------------------

def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN baseline: broadcast the query set (vec_id < 8) against
    the corpus, dot product + norms as JVM array expressions
    (`aggregate`/`zip_with`), top-5 per query via window. The corpus
    never shuffles — the plan is scan → broadcast-nested-loop → window
    on a |Q|·k result. LSH-bucketed variant in operators/similarity.py
    is the subquadratic scale path."""
    # per-row norms precomputed before the join (see embedding_near_dups)
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
           .withColumn("nv", norm(F.col("v"))))
    queries = (emb.filter(F.col("vec_id") < 8)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("v").alias("q_v"), F.col("nv").alias("nq")))
    dot = F.aggregate(F.zip_with("v", "q_v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    scored = (emb.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("q_id"))
              .select("q_id", "vec_id",
                      F.round(dot / (F.col("nv") * F.col("nq")),
                              6).alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("q_id", "vec_id", "cosine", "rank"))


_COSINE_TOPK_SQL = """
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id < 8),
scored AS (
  SELECT q_id, vec_id,
         round(list_dot_product(v, q_v)
               / (sqrt(list_dot_product(v, v))
                  * sqrt(list_dot_product(q_v, q_v))), 6) AS cosine
  FROM emb CROSS JOIN q
  WHERE vec_id <> q_id)
SELECT q_id, vec_id, cosine, rank FROM (
  SELECT q_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cosine DESC, vec_id ASC) AS INT) AS rank
  FROM scored) t
WHERE rank <= 5
"""


# -- D5b: BPE-ish regex token counting ---------------------------------------

# GPT-2-style pre-tokenizer shape, ASCII-restricted so the Java (Spark)
# and RE2 (DuckDB) regex dialects agree: contraction tails, space+letters,
# space+digits, space+other-symbols. No lookarounds (RE2 has none).
_BPE_PAT = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (LLM-pipeline D-spec): whitespace split
    and a BPE-ish regex pre-tokenizer — pure regexp_extract_all, stays
    in codegen; a real BPE merge table would layer on top of these
    pre-tokens as a lookup join."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0))
         .alias("bpe_tokens"))


_TOKEN_COUNTS_SQL = rf"""
SELECT doc_id,
       CAST(len(string_split_regex(text, '\s+')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PAT.replace("'", "''")}'))
            AS INT) AS bpe_tokens
FROM documents
"""


def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-20 (explode → hash agg → top-k).
    The explode fans each doc into |tokens| rows, but map-side partial
    aggregation collapses them to |vocab| per partition before the
    shuffle — corpus-size-independent shuffle volume."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .select(F.explode(F.split(F.col("text"), r"\s+"))
                    .alias("token"))
            .filter(F.col("token") != "")
            .groupBy("token")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("token"))
            .limit(20))


_TOP_TOKENS_SQL = r"""
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
      FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 20
"""


# -- D5c: embedding-cosine near-dup (nearest neighbor + threshold flag) ------

_EMB_BLOCKS = 16  # G: G² block pairs; grow with corpus size at scale


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup (dedup family, D-spec): each vector's
    exact nearest neighbor by cosine, flagged when cosine ≥ 0.4.

    Distributed blocked GEMM — NO driver materialization: vectors hash
    into G blocks, each block packs to ONE row (ids array + flattened
    row-major matrix), the G×G block-pair cross join fans the O(n²)
    score space across the cluster, and each pair computes its partial
    per-query argmax through one BLAS matrix multiply in `mapInPandas`.
    A final `groupBy(vec_id).max(struct(cosine, -nn_id))` merges the G
    partials per query into the exact global nearest neighbor. Unlike
    the broadcast-corpus kernel this has no driver collect and no
    single-executor memory ceiling: peak per-task memory is two blocks
    (n/G rows each), and G scales with the corpus. Exact NN is
    inherently O(n²) — at scale the registered default is
    :func:`embedding_ann_near_dups` (SRP-banded candidates + exact
    rescore, end of this module); this exact kernel is the
    oracle-parity verifier and recall referee.

    Tie-break parity with the SQL oracle: partials rank by ROUNDED
    cosine; within a block np.argmax's first hit is the smallest nn_id
    (blocks are packed sorted by vec_id), and the merge struct orders
    by (cosine, -nn_id), so ties resolve to the smallest id globally —
    same as the oracle's `ORDER BY cosine DESC, nn_id ASC`.
    """
    import numpy as np
    import pandas as pd

    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    blk = (emb.groupBy(F.pmod(F.hash("vec_id"), F.lit(_EMB_BLOCKS))
                       .alias("gid"))
           .agg(F.array_sort(F.collect_list(F.struct("vec_id", "v")))
                .alias("b"))
           .select("gid",
                   F.transform("b", lambda x: x["vec_id"]).alias("ids"),
                   F.flatten(F.transform("b", lambda x: x["v"]))
                   .alias("flat")))
    pairs = (blk.select(F.col("ids").alias("qids"),
                        F.col("flat").alias("qflat"))
             .crossJoin(blk.select(F.col("ids").alias("cids"),
                                   F.col("flat").alias("cflat"))))

    def score(batches):
        for pdf in batches:
            for qids_l, qflat, cids_l, cflat in zip(
                    pdf["qids"], pdf["qflat"], pdf["cids"], pdf["cflat"]):
                qids = np.asarray(qids_l, dtype=np.int64)
                cids = np.asarray(cids_l, dtype=np.int64)
                Q = np.asarray(qflat, dtype=np.float64).reshape(
                    len(qids), -1)
                C = np.asarray(cflat, dtype=np.float64).reshape(
                    len(cids), -1)
                nq = np.sqrt((Q * Q).sum(axis=1))
                nc = np.sqrt((C * C).sum(axis=1))
                S = (Q @ C.T) / np.outer(nq, nc)
                # round half-away-from-zero (np.round is half-to-even):
                # DuckDB's round() and Spark's F.round are half-away, so
                # a cosine landing exactly on a 0.0000005 boundary must
                # not flip the argmax tie-break vs the oracle
                S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
                S[qids[:, None] == cids[None, :]] = -np.inf  # mask self
                best = S.argmax(axis=1)
                cos = S[np.arange(len(qids)), best]
                keep = np.isfinite(cos)  # self-only block pairs
                yield pd.DataFrame({
                    "vec_id": qids[keep],
                    "nn_id": cids[best][keep],
                    "cosine": cos[keep],
                })

    partials = pairs.mapInPandas(
        score, schema="vec_id long, nn_id long, cosine double")
    best = (partials.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("cosine"),
                                (-F.col("nn_id")).alias("neg_nn")))
                 .alias("t")))
    return best.select(
        "vec_id",
        (-F.col("t.neg_nn")).alias("nn_id"),
        F.col("t.cosine").alias("cosine"),
        (F.col("t.cosine") >= 0.4).cast("int").alias("is_near_dup"))


def embedding_near_dups_broadcast_kernel(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """Test-side verifier for :func:`embedding_near_dups`: the original
    broadcast-corpus GEMM kernel (collects the corpus matrix to the
    driver — capped, NOT registered; the distributed blocked version
    above is the product path)."""
    import numpy as np
    import pandas as pd

    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    n_corpus = emb.count()
    if n_corpus > 200_000:
        raise ValueError(
            f"broadcast kernel capped at 200k vectors (got {n_corpus})")
    corpus = emb.orderBy("vec_id").toPandas()
    ids = corpus["vec_id"].to_numpy()
    C = np.stack(corpus["v"].to_numpy()).astype(np.float64)
    nc = np.sqrt((C * C).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, C, nc))

    def score(batches):
        ids_c, C_c, nc_c = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nq = np.sqrt((Q * Q).sum(axis=1))
            S = (Q @ C_c.T) / np.outer(nq, nc_c)
            S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
            qids = pdf["vec_id"].to_numpy()
            S[qids[:, None] == ids_c[None, :]] = -np.inf  # mask self
            best = S.argmax(axis=1)
            cos = S[np.arange(len(Q)), best]
            yield pd.DataFrame({
                "vec_id": qids,
                "nn_id": ids_c[best],
                "cosine": cos,
                "is_near_dup": (cos >= 0.4).astype("int32"),
            })

    return emb.mapInPandas(
        score, schema="vec_id long, nn_id long, cosine double, "
                      "is_near_dup int")


_EMB_NEAR_DUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT a.vec_id, b.vec_id AS nn_id,
         round(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM e a JOIN e b ON a.vec_id <> b.vec_id)
SELECT vec_id, nn_id, cosine,
       CASE WHEN cosine >= 0.4 THEN 1 ELSE 0 END AS is_near_dup
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY cosine DESC, nn_id ASC) AS rn
      FROM scored) t
WHERE rn = 1
"""


# -- D5d: TF-IDF term weighting ----------------------------------------------

def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, sklearn's smooth_idf formula — public
    knowledge). Shape: explode → (doc,token) hash agg → token df agg →
    join → per-doc window top-k. Both aggregations are map-side
    combinable; the tf↔df join is on `token` (vocab-sized, AQE picks
    broadcast while the vocab fits, shuffle-hash beyond). No UDF."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id", F.explode(F.split(F.col("text"), r"\s+"))
                   .alias("token"))
           .filter(F.col("token") != ""))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n_docs = docs.count()
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (tf.join(dfreq, "token")
              .select("doc_id", "token",
                      F.round(F.col("tf") * idf, 6).alias("tfidf")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"),
                                             F.asc("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3))


_TFIDF_SQL = r"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE token <> '' GROUP BY doc_id, token),
n AS (SELECT count(*) AS n_docs FROM documents),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT doc_id, tf.token,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN dfq USING (token) CROSS JOIN n)
SELECT doc_id, token, tfidf, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY tfidf DESC, token ASC) AS INT) AS rk
  FROM scored) t
WHERE rk <= 3
"""


# -- D5e: quality-filter decision --------------------------------------------

def quality_filter_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus keep/drop decision from the quality features:
    rule thresholds over token count and mean word length, with a
    machine-readable reason list. Pure expressions over one scan — the
    shape of every at-scale corpus filter (flag, don't delete; the
    keep=1 subset is the training view)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), r"\s+")
    n_tok = F.size(tokens)
    mwl = F.length(F.regexp_replace("text", r"\s", "")) / n_tok
    too_short = n_tok < 25
    too_long = n_tok > 90
    bad_words = (mwl < 3.0) | (mwl > 9.0)
    keep = ~(too_short | too_long | bad_words)
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mwl, 6).alias("mean_word_len"),
        keep.cast("int").alias("keep"),
        F.concat_ws(",",
                    F.when(too_short, F.lit("too_short")),
                    F.when(too_long, F.lit("too_long")),
                    F.when(bad_words, F.lit("word_len_outlier")))
         .alias("fail_reasons"))


_QUALITY_FILTER_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
         length(regexp_replace(text, '\s', '', 'g'))
           * 1.0 / len(string_split_regex(text, '\s+')) AS mwl
  FROM documents)
SELECT doc_id, n_tokens,
       round(mwl, 6) AS mean_word_len,
       CASE WHEN NOT (n_tokens < 25 OR n_tokens > 90
                      OR mwl < 3.0 OR mwl > 9.0)
            THEN 1 ELSE 0 END AS keep,
       concat_ws(',',
                 CASE WHEN n_tokens < 25 THEN 'too_short' END,
                 CASE WHEN n_tokens > 90 THEN 'too_long' END,
                 CASE WHEN mwl < 3.0 OR mwl > 9.0
                      THEN 'word_len_outlier' END) AS fail_reasons
FROM s
"""


# -- D6: multimodal binary-column plumbing -----------------------------------

def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pattern: media as opaque `binary` + typed metadata.
    The blob here is the utf-8 encoding of `text`; the Spark-side
    plumbing (binary column, byte length, content hash, format tag) is
    the point of this entry — real byte-level decode lives in
    `media_decode_stats` (BMP/PPM/WAV parsers, operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(blob).alias("blob_bytes"),
        F.md5(blob).alias("blob_md5"),
        F.lit("text/plain").alias("media_type"))


_MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS blob_bytes,
       md5(text) AS blob_md5,
       'text/plain' AS media_type
FROM documents
"""


def unigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality score (perplexity's memoryless cousin, the
    cheap first-pass LM filter in training-data pipelines): train a
    unigram model on the corpus itself, score each document by its
    average negative log-probability. Low = stereotyped/repetitive,
    high = rare-token-heavy (both tails are what quality filters cut).

    Two aggregations over one tokenization: the vocab table is a
    map-combined (token, count) agg whose shuffle is bounded by |vocab|
    per partition, and the scoring pass joins tokens back to it —
    skew-robust because stop-word keys are exactly the map-combinable
    ones. The corpus total rides on one broadcast scalar row.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    vocab = toks.groupBy("token").agg(F.count("*").alias("tf"))
    total = vocab.agg(F.sum("tf").alias("corpus_tokens"))
    return (toks.join(vocab, "token")
            .crossJoin(F.broadcast(total))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.round(F.avg(-F.log(F.col("tf")
                                      / F.col("corpus_tokens"))), 6)
                 .alias("avg_neg_logprob")))


_UNIGRAM_LP_SQL = r"""
WITH toks AS (SELECT doc_id,
                     unnest(string_split_regex(text, '\s+')) AS token
              FROM documents),
t AS (SELECT * FROM toks WHERE token <> ''),
vocab AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
total AS (SELECT sum(tf) AS corpus_tokens FROM vocab)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-ln(tf / corpus_tokens)), 6) AS avg_neg_logprob
FROM t JOIN vocab USING (token) CROSS JOIN total
GROUP BY doc_id
"""


QUERIES = {
    "exact_dedup_groups": exact_dedup_groups,
    "unigram_logprob_scores": unigram_logprob_scores,
    "ngram_jaccard_top_pairs": ngram_jaccard_top_pairs,
    "doc_quality_stats": doc_quality_stats,
    "lang_id_heuristic": lang_id_heuristic,
    "cosine_topk": cosine_topk,
    "token_counts": token_counts,
    "top_tokens": top_tokens,
    "tfidf_top_terms": tfidf_top_terms,
    "quality_filter_flags": quality_filter_flags,
    "embedding_near_dups": embedding_near_dups,
    "multimodal_metadata": multimodal_metadata,
}

ORACLES = {
    "token_counts": _TOKEN_COUNTS_SQL,
    "unigram_logprob_scores": _UNIGRAM_LP_SQL,
    "top_tokens": _TOP_TOKENS_SQL,
    "tfidf_top_terms": _TFIDF_SQL,
    "quality_filter_flags": _QUALITY_FILTER_SQL,
    "embedding_near_dups": _EMB_NEAR_DUP_SQL,
    "exact_dedup_groups": _EXACT_DEDUP_SQL,
    "ngram_jaccard_top_pairs": _JACCARD_SQL,
    "doc_quality_stats": _QUALITY_SQL,
    "lang_id_heuristic": _LANG_ID_SQL,
    "cosine_topk": _COSINE_TOPK_SQL,
    "multimodal_metadata": _MULTIMODAL_SQL,
}


# -- D5d: edit-distance near-dup (blocked Levenshtein) -----------------------

_ED_BLOCK = 16   # chars of the normalized prefix used as the block key
_ED_PREFIX = 64  # chars compared by edit distance
_ED_MAX = 8


def edit_distance_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by bounded edit distance — the dedup-family
    member that catches single-character drift (OCR noise, version
    strings) that token-level MinHash/SimHash miss.

    Levenshtein is O(len²) per pair, so all-pairs is never an option:
    candidates come from an equi-join on a normalized prefix block key
    (pairs must agree on their first 16 lowercased chars), which makes
    the join a plain hash join whose volume is Σ|block|² — the same
    blocking idea production fuzzy-dedup uses (sorted-neighborhood /
    prefix blocking). The distance then runs only on candidate pairs,
    over capped 64-char prefixes so the per-pair cost is bounded."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    d = docs.select("doc_id",
                    F.substring(t, 1, _ED_BLOCK).alias("blk"),
                    F.substring(t, 1, _ED_PREFIX).alias("pre"))
    a = d.select(F.col("doc_id").alias("doc_a"), "blk",
                 F.col("pre").alias("pre_a"))
    b = d.select(F.col("doc_id").alias("doc_b"),
                 F.col("blk").alias("blk_b"),
                 F.col("pre").alias("pre_b"))
    return (a.join(b, (F.col("blk") == F.col("blk_b"))
                   & (F.col("doc_a") < F.col("doc_b")))
            .select("doc_a", "doc_b",
                    F.levenshtein("pre_a", "pre_b").alias("edit_distance"))
            .filter(F.col("edit_distance") <= _ED_MAX))


_EDIT_DIST_SQL = f"""
WITH d AS (SELECT doc_id,
                  substr(lower(text), 1, {_ED_BLOCK}) AS blk,
                  substr(lower(text), 1, {_ED_PREFIX}) AS pre
           FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pre, b.pre) AS INT) AS edit_distance
FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= {_ED_MAX}
"""


QUERIES["edit_distance_near_dups"] = edit_distance_near_dups
ORACLES["edit_distance_near_dups"] = _EDIT_DIST_SQL


# -- D6: word-vocab construction + coverage (tokenizer-prep stats) -----------

_VOCAB_SIZE = 256


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep report: build the top-N word vocabulary (count
    desc, token asc — the deterministic truncation every tokenizer
    trainer runs first), then measure per-source coverage: what
    fraction of token OCCURRENCES the vocab captures and the OOV rate
    a word-level model would face.

    Two aggs over one tokenization: the vocab is a map-combined count
    + TakeOrdered truncation (driver holds N rows, broadcast back);
    coverage joins tokens→vocab per source — the stopword-heavy keys
    are exactly the map-combinable ones, so the shuffle stays
    |vocab|-bounded per partition."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
        .filter(F.col("token") != ""))
    vocab = (toks.groupBy("token").agg(F.count("*").alias("tf"))
             .orderBy(F.desc("tf"), F.asc("token"))
             .limit(_VOCAB_SIZE)
             .select("token"))
    flagged = toks.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))),
                        "token", "left")
    return (flagged.groupBy("source")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("token").alias("n_types"),
                 F.round(F.sum(F.coalesce(F.col("in_vocab"), F.lit(0)))
                         / F.count("*"), 6).alias("vocab_coverage"),
                 F.round(F.sum(F.when(F.col("in_vocab").isNull(), 1)
                               .otherwise(0)) / F.count("*"), 6)
                 .alias("oov_rate")))


_VOCAB_COVERAGE_SQL = rf"""
WITH toks AS (SELECT source,
                     unnest(string_split_regex(text, '\s+')) AS token
              FROM documents),
t AS (SELECT * FROM toks WHERE token <> ''),
vocab AS (SELECT token FROM (
            SELECT token, count(*) AS tf FROM t GROUP BY token
            ORDER BY tf DESC, token ASC LIMIT {_VOCAB_SIZE})),
flagged AS (SELECT t.source, t.token,
                   CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS in_vocab
            FROM t LEFT JOIN vocab v ON t.token = v.token)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT token) AS BIGINT) AS n_types,
       round(sum(in_vocab) * 1.0 / count(*), 6) AS vocab_coverage,
       round(sum(1 - in_vocab) * 1.0 / count(*), 6) AS oov_rate
FROM flagged GROUP BY source
"""


# -- D7: cross-source duplicate leakage (train/eval contamination check) -----

def cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content collisions across DIFFERENT sources — the
    train/eval leakage a split-by-source design must audit before
    training. One hash agg: groups whose docs span ≥2 sources, with
    the colliding source set (sorted for determinism)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy(F.md5("text").alias("text_hash"))
            .agg(F.countDistinct("source").alias("n_sources"),
                 F.count("*").alias("n_docs"),
                 F.array_sort(F.collect_set("source")).alias("sources"),
                 F.min("doc_id").alias("min_doc_id"))
            .filter(F.col("n_sources") >= 2)
            .select("text_hash", "n_sources", "n_docs",
                    F.to_json("sources").alias("sources_json"),
                    "min_doc_id"))


_LEAKAGE_SQL = """
SELECT md5(text) AS text_hash,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_docs,
       to_json(list_sort(list_distinct(list(source)))) AS sources_json,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY md5(text)
HAVING count(DISTINCT source) >= 2
"""


QUERIES["vocab_coverage"] = vocab_coverage
QUERIES["cross_source_leakage"] = cross_source_leakage
ORACLES["vocab_coverage"] = _VOCAB_COVERAGE_SQL
ORACLES["cross_source_leakage"] = _LEAKAGE_SQL


# ---------------------------------------------------------------------------
# Bigram LM quality score (round-4 tail): the context-aware upgrade of
# unigram_logprob_scores — fluency filtering needs P(w2|w1), not just
# token rarity.
# ---------------------------------------------------------------------------

_BG_K = 0.5  # Lidstone add-k smoothing


def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM scored on the corpus itself with add-k smoothing:
    P(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V). Per-doc average
    negative log-prob — low = stereotyped, high = disfluent/rare
    transitions, the two tails a fluency filter cuts. Docs with < 2
    tokens have no bigrams and drop out (same in the oracle).

    Shape: bigrams unfold MAP-SIDE from the token array (shifted-slice
    zip_with, no position join); the bigram/left-context count tables
    are map-combined aggs; vocabulary size rides one broadcast scalar.
    The scoring join shuffles on (w1, w2) — stop-word-pair skew is
    exactly the map-combinable case."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    n = F.greatest(F.size(w) - 1, F.lit(0))
    big = F.zip_with(F.slice(w, 1, n), F.slice(w, 2, n),
                     lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    pairs = (docs.select("doc_id", F.explode(big).alias("bg"))
             .select("doc_id", F.col("bg.w1").alias("w1"),
                     F.col("bg.w2").alias("w2")))
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uc = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    vsz = (docs.select(F.explode(w).alias("tok"))
           .agg(F.countDistinct("tok").alias("vsz")))
    p = (F.col("c2") + F.lit(_BG_K)) / (F.col("c1")
                                        + F.lit(_BG_K) * F.col("vsz"))
    return (pairs.join(bc, ["w1", "w2"]).join(uc, ["w1"])
            .crossJoin(F.broadcast(vsz))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(-F.log(p)), 6).alias("avg_neg_logprob")))


_BIGRAM_LP_SQL = rf"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '') AS tk
           FROM documents),
pairs AS (SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
          FROM d, LATERAL (SELECT unnest(range(1, len(tk))) AS i) ix),
bc AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
uc AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY w1),
v AS (SELECT count(DISTINCT tok) AS vsz
      FROM (SELECT unnest(tk) AS tok FROM d))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-ln((c2 + {_BG_K}) / (c1 + {_BG_K} * vsz))), 6)
         AS avg_neg_logprob
FROM pairs JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# ANN-first embedding near-dup (round-5): the scale-path default.
# `embedding_near_dups` (exact blocked GEMM above) stays registered as
# the oracle-parity verifier, but its score space is O(n²) by problem
# statement; this variant bounds the pair set with portable SRP-LSH
# bands FIRST and exact-rescoring only candidates, which is the shape
# that survives 100 TB. Semantics: nearest neighbor AMONG LSH
# candidates (banded index join — never a block cross join); rows with
# no candidate keep a sentinel row (nn_id -1, cosine -2). The oracle
# replays planes → signatures → candidates bit-for-bit, so correctness
# is hash-checked at any scale factor regardless of ANN recall; recall
# itself is pinned by tests/test_similarity.py against the exact kernel
# (1.0 on a planted near-dup fixture — the cosine ≥ 0.8 regime LSH is
# parameterized for; measured-and-bounded on the random-vector
# testdata, whose NN cosines ~0.27-0.51 are information-theoretically
# hostile to sub-quadratic exact NN).
# ---------------------------------------------------------------------------

_ANN_PLANES = 128
_ANN_BAND_BITS = 8  # 16 bands × 256-value signatures
_ANN_DIM = 64


def embedding_ann_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-candidate + exact-rescore near-dup flagging (dedup family,
    D-spec; scale default — see section comment).

    Plan shape: one corpus scan → Arrow GEMM signatures (16 rows per
    vector, operators/similarity.srp_signatures) → self equi-join on
    (band, sig) — a plain shuffled hash join whose volume is
    Σ|bucket|², never n² — → distinct candidate pairs → vectors
    re-attached by id → exact cosine on candidates only → per-vector
    argmax with (rounded cosine, smallest id) tie-break → left join
    back to all vec_ids so every vector keeps a row."""
    from threat_detection_nosql_spark.operators import similarity

    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v")))
    planes = similarity.srp_planes(_ANN_PLANES, _ANN_DIM)
    # localCheckpoint: the LSH index (16 small rows per vector) is
    # consumed by both sides of the band self-join — pin it so the
    # signature GEMM runs once per call (at scale this is the persisted
    # index table, cf. the IVF cell-partitioned sink)
    sigs = similarity.srp_signatures(
        emb, planes, band_bits=_ANN_BAND_BITS).localCheckpoint()
    # no .distinct(): a pair colliding in k bands is scored k times,
    # but the per-vector argmax is duplicate-invariant and the extra
    # score work (~7% at these params) is cheaper than a full
    # 280k-row dedup shuffle
    cand = (sigs.alias("a")
            .join(sigs.alias("b"), ["band", "sig"])
            .filter(F.col("a.vec_id") != F.col("b.vec_id"))
            .select(F.col("a.vec_id").alias("vec_id"),
                    F.col("b.vec_id").alias("nn_id")))
    import numpy as np
    import pandas as pd

    def score(batches):
        # row-wise cosine over the candidate batch in one BLAS pass —
        # the interpreted aggregate(zip_with) expression costs ~10x
        # more per pair. Rounding is half-away-from-zero to match
        # DuckDB/Spark round() (np.round is half-to-even).
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.vstack(pdf["qv"].to_numpy())
            C = np.vstack(pdf["cv"].to_numpy())
            cos = ((Q * C).sum(axis=1)
                   / (np.sqrt((Q * Q).sum(axis=1))
                      * np.sqrt((C * C).sum(axis=1))))
            cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "nn_id": pdf["nn_id"],
                                "cosine": cos})

    scored = (cand
              .join(emb.select(F.col("vec_id"),
                               F.col("v").alias("qv")), "vec_id")
              .join(emb.select(F.col("vec_id").alias("nn_id"),
                               F.col("v").alias("cv")), "nn_id")
              .mapInPandas(score,
                           schema="vec_id long, nn_id long, cosine double"))
    best = (scored.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("cosine"),
                                (-F.col("nn_id")).alias("neg_nn")))
                 .alias("t")))
    return (emb.select("vec_id").join(best, "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce(-F.col("t.neg_nn"), F.lit(-1)).alias("nn_id"),
                F.coalesce(F.col("t.cosine"), F.lit(-2.0)).alias("cosine"),
                (F.coalesce(F.col("t.cosine"), F.lit(-2.0)) >= 0.4)
                .cast("int").alias("is_near_dup")))


def _ann_near_dup_sql() -> str:
    from threat_detection_nosql_spark.operators import similarity
    planes = similarity.srp_planes(_ANN_PLANES, _ANN_DIM)
    rows = ",\n  ".join(
        f"({p // _ANN_BAND_BITS}, {p % _ANN_BAND_BITS}, "
        f"[{', '.join(repr(w) for w in plane)}]::DOUBLE[])"
        for p, plane in enumerate(planes))
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
planes(band, pos, w) AS (VALUES
  {rows}),
sigs AS (SELECT vec_id, band,
                CAST(sum(CASE WHEN list_dot_product(v, w) > 0
                              THEN 1 << pos ELSE 0 END) AS BIGINT) AS sig
         FROM emb CROSS JOIN planes GROUP BY vec_id, band),
cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS nn_id
         FROM sigs a JOIN sigs b ON a.band = b.band AND a.sig = b.sig
         WHERE a.vec_id <> b.vec_id),
scored AS (SELECT cand.vec_id, cand.nn_id,
                  round(list_dot_product(q.v, c.v)
                        / (sqrt(list_dot_product(q.v, q.v))
                           * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
           FROM cand
           JOIN emb q ON q.vec_id = cand.vec_id
           JOIN emb c ON c.vec_id = cand.nn_id),
best AS (SELECT vec_id, nn_id, cosine FROM (
           SELECT vec_id, nn_id, cosine,
                  row_number() OVER (PARTITION BY vec_id
                       ORDER BY cosine DESC, nn_id ASC) AS rn
           FROM scored) t WHERE rn = 1)
SELECT e.vec_id,
       COALESCE(b.nn_id, -1) AS nn_id,
       COALESCE(b.cosine, CAST(-2.0 AS DOUBLE)) AS cosine,
       CASE WHEN COALESCE(b.cosine, CAST(-2.0 AS DOUBLE)) >= 0.4
            THEN 1 ELSE 0 END AS is_near_dup
FROM emb e LEFT JOIN best b ON b.vec_id = e.vec_id
"""


QUERIES_TAIL = {"bigram_logprob_scores": bigram_logprob_scores,
                "embedding_ann_near_dups": embedding_ann_near_dups}
ORACLES_TAIL = {"bigram_logprob_scores": _BIGRAM_LP_SQL,
                "embedding_ann_near_dups": _ann_near_dup_sql()}


# ---------------------------------------------------------------------------
# Duplicated-span fraction (round-5): the Gopher/MassiveText repetition
# filter at corpus grain — C4 drops duplicated three-sentence spans,
# MassiveText drops docs whose duplicate-line fraction is high. The
# corpus analog over whitespace text: the fraction of a doc's word
# 5-gram spans that also occur in at least one OTHER document.
# ---------------------------------------------------------------------------

_SPAN_N = 5          # words per span
_SPAN_MAX_DUP = 0.3  # keep docs with <= 30% cross-doc duplicated spans


def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction and the keep/drop flag.

    Shape: spans unfold MAP-SIDE from the token array (shifted-slice
    zip_with — no position join, no UDF); the span→doc-frequency table
    is one distinct + one map-combinable agg keyed on the span string
    (heavy-hitter spans are exactly the map-combinable case); the
    verdict joins spans back on the span key and re-aggregates per doc.
    Docs shorter than the span width keep a row (0 spans, dup_ratio 0,
    keep 1) via the left join — same in the oracle."""
    from threat_detection_nosql_spark.sources.readers import spread
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
    n = F.greatest(F.size(w) - _SPAN_N + 1, F.lit(0))
    grams = F.slice(w, 1, n)
    for j in range(1, _SPAN_N):
        grams = F.zip_with(grams, F.slice(w, j + 1, n),
                           lambda a, b: F.concat_ws(" ", a, b))
    spans = (docs.select("doc_id", F.explode(grams).alias("span")))
    # distinct docs per span (a doc repeating its own span is not
    # cross-doc duplication)
    span_df = (spans.distinct()
               .groupBy("span")
               .agg(F.count("*").alias("span_docs")))
    per_doc = (spans.join(span_df, "span")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_spans"),
                    F.sum(F.when(F.col("span_docs") >= 2, 1).otherwise(0))
                    .alias("n_dup_spans")))
    return (docs.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
                    F.coalesce("n_dup_spans", F.lit(0))
                    .alias("n_dup_spans"))
            .withColumn("dup_ratio", F.round(
                F.when(F.col("n_spans") > 0,
                       F.col("n_dup_spans") / F.col("n_spans"))
                .otherwise(F.lit(0.0)), 6))
            .withColumn("keep",
                        (F.col("dup_ratio") <= _SPAN_MAX_DUP)
                        .cast("int")))


_DUP_SPAN_SQL = rf"""
WITH d AS (SELECT doc_id,
                  list_filter(string_split_regex(text, '\s+'),
                              x -> x <> '') AS tk
           FROM documents),
spans AS (SELECT doc_id,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                       || tk[i+3] || ' ' || tk[i+4] AS span
          FROM d, LATERAL (SELECT unnest(range(1, len(tk) - {_SPAN_N - 2}))
                           AS i) ix),
span_df AS (SELECT span, count(*) AS span_docs
            FROM (SELECT DISTINCT doc_id, span FROM spans)
            GROUP BY span),
per_doc AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_spans
            FROM spans JOIN span_df USING (span)
            GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(n_dup_spans, 0) AS n_dup_spans,
       round(CASE WHEN COALESCE(n_spans, 0) > 0
                  THEN n_dup_spans / (1.0 * n_spans)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS dup_ratio,
       CASE WHEN round(CASE WHEN COALESCE(n_spans, 0) > 0
                            THEN n_dup_spans / (1.0 * n_spans)
                            ELSE CAST(0.0 AS DOUBLE) END, 6)
                 <= {_SPAN_MAX_DUP}
            THEN 1 ELSE 0 END AS keep
FROM d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
"""

QUERIES_TAIL["dup_span_stats"] = dup_span_stats
ORACLES_TAIL["dup_span_stats"] = _DUP_SPAN_SQL


# -- D5k: BM25 term weighting ------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by Okapi BM25 (Lucene's formula — public
    knowledge: idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf norm =
    tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl)), k1=1.2, b=0.75).

    Extends ``tfidf_top_terms`` (same explode → (doc,token) agg → df
    agg → join → windowed top-k shape — SURVEY §2.10 text-analysis
    family) with the length-normalized saturating tf that every
    retrieval/quality pipeline actually ships. The doc-length table
    rides the SAME (doc,token) aggregate (sum of tf per doc — a second
    map-combinable agg, no extra scan), and N/avgdl are two driver-side
    scalars (one count + one 1-row agg, the only collected bytes). The
    tf↔df join is on `token` (vocab-sized → AQE broadcast), the
    tf↔dl join on `doc_id` (co-partitioned with the window that
    follows). No UDF anywhere — survives a 100× corpus by the same
    argument as TF-IDF."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id", F.explode(F.split(F.col("text"), r"\s+"))
                   .alias("token"))
           .filter(F.col("token") != ""))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_docs = docs.count()
    total_tokens = dl.agg(F.sum("dl")).collect()[0][0]
    avgdl = float(total_tokens) / float(n_docs)
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    norm = (F.col("tf") * (_BM25_K1 + 1.0)
            / (F.col("tf") + _BM25_K1
               * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.lit(avgdl))))
    scored = (tf.join(dfreq, "token").join(dl, "doc_id")
              .select("doc_id", "token",
                      F.round(idf * norm, 6).alias("bm25")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("bm25"),
                                             F.asc("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3))


_BM25_SQL = rf"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE token <> '' GROUP BY doc_id, token),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS n_docs,
                 (SELECT CAST(sum(dl) AS DOUBLE) FROM dl)
                 / (SELECT CAST(count(*) AS DOUBLE) FROM documents) AS avgdl),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * ({_BM25_K1} + 1.0)
                  / (tf + {_BM25_K1}
                     * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))), 6)
           AS bm25
  FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id)
  CROSS JOIN stats)
SELECT doc_id, token, bm25, rk FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY bm25 DESC, token ASC) AS INT) AS rk
  FROM scored) t
WHERE rk <= 3
"""

QUERIES_TAIL["bm25_top_terms"] = bm25_top_terms
ORACLES_TAIL["bm25_top_terms"] = _BM25_SQL


# -- D5l: feature hashing (the hashing trick) ---------------------------------

_FH_BUCKETS = 64


def hashed_feature_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc sparse feature vector by the hashing trick (Weinberger
    et al. 2009 — public knowledge): token → md5-derived 60-bit hash →
    bucket = hash % 64, counts aggregated per (doc, bucket). The
    fixed-width, vocabulary-free featurization step for any model that
    can't carry a fitted vocabulary across a 100× corpus — no global
    dictionary, no second pass, no driver state.

    Shape: explode → one map-combinable (doc, bucket) hash agg; the
    bucket expression (md5 prefix → BIGINT → mod) runs inside codegen.
    Output is the COO form of the doc×64 matrix (sparse rows only)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id", F.explode(F.split(F.col("text"), r"\s+"))
                   .alias("token"))
           .filter(F.col("token") != ""))
    bucket = (F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
              .cast("long") % _FH_BUCKETS)
    return (tok.select("doc_id", bucket.alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").alias("tf")))


_FEATURE_HASH_SQL = rf"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents)
SELECT doc_id,
       CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
         % {_FH_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS tf
FROM tok WHERE token <> ''
GROUP BY 1, 2
"""

QUERIES_TAIL["hashed_feature_counts"] = hashed_feature_counts
ORACLES_TAIL["hashed_feature_counts"] = _FEATURE_HASH_SQL


# -- D5m: document novelty ----------------------------------------------------

def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty: the share of its DISTINCT word 3-shingles that
    appear nowhere else in the corpus (document frequency 1) — high
    novelty marks original text worth keeping, low novelty marks
    boilerplate assembled from common fragments; the complement of the
    duplicated-span gate (``dup_span_stats`` asks "how much of this doc
    repeats", novelty asks "how much exists only here").

    Shape: one explode → DISTINCT (doc, shingle) projection feeding
    BOTH the shingle-df aggregate and the scoring join (both
    map-combinable / shuffle on the shingle key); the novelty ratio is
    integer counts divided once and rounded. Docs shorter than one
    shingle emit 0 shingles and are reported with NULL novelty rather
    than dropped."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the split FIRST: element_at inside a transform lambda
    # embeds its argument expression, so referencing split(text) there
    # re-tokenizes the doc per element access (O(len²) — measured ~6 s
    # for a 260k-row explode at sf0.1; ~1 s with the array pinned to a
    # column)
    words = docs.select("doc_id", F.split(F.col("text"), r"\s+")
                        .alias("wds"))
    w = F.col("wds")
    # guard: Spark sequence(1, 0) generates DESCENDING [1, 0] — a
    # sub-3-word doc must yield an empty array, not bogus indices
    shingles = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(" ", F.element_at(w, i),
                                  F.element_at(w, i + 1),
                                  F.element_at(w, i + 2)))
    ).otherwise(F.array().cast("array<string>"))
    sh = (words.select("doc_id", F.explode(shingles).alias("shingle"))
          .filter(F.col("shingle") != "")
          .distinct()
          # consumed TWICE (df agg + scoring join): pin so the explode
          # + distinct shuffle runs once (7.1 s -> ~4 s at sf0.1)
          .localCheckpoint(eager=True))
    # a df==1 shingle has exactly ONE owner doc, so carrying
    # min(doc_id) in the df aggregate replaces the 2.5M-row
    # shingle-keyed join with two map-combinable aggs of `sh` plus a
    # |docs|-row join — measured ~6.2 s -> ~2.5 s at sf0.1
    dfreq = (sh.groupBy("shingle")
             .agg(F.count("*").alias("df"),
                  F.min("doc_id").alias("owner")))
    uniq = (dfreq.filter(F.col("df") == 1)
            .groupBy(F.col("owner").alias("doc_id"))
            .agg(F.count("*").alias("n_unique")))
    per_doc = (sh.groupBy("doc_id")
               .agg(F.count("*").alias("n_shingles"))
               .join(uniq, "doc_id", "left")
               .withColumn("n_unique",
                           F.coalesce(F.col("n_unique"), F.lit(0))))
    return (docs.select("doc_id")
            .join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
                    F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
                    F.when(F.col("n_shingles") > 0,
                           F.round(F.col("n_unique") * 1.0
                                   / F.col("n_shingles"), 6))
                    .alias("novelty")))


_NOVELTY_SQL = r"""
WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wds
           FROM documents),
sh AS (SELECT DISTINCT doc_id,
              wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS shingle
       FROM w, LATERAL (SELECT unnest(range(1, greatest(len(wds) - 1, 1)))
                        AS i) ix
       WHERE wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] <> ''),
dfreq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
          FROM sh GROUP BY 1),
per_doc AS (SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unique
            FROM sh JOIN dfreq USING (shingle)
            GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(n_shingles, 0) AS n_shingles,
       COALESCE(n_unique, 0) AS n_unique,
       CASE WHEN COALESCE(n_shingles, 0) > 0
            THEN round(n_unique * 1.0 / n_shingles, 6) END AS novelty
FROM documents d LEFT JOIN per_doc ON per_doc.doc_id = d.doc_id
"""

QUERIES_TAIL["doc_novelty_scores"] = doc_novelty_scores
ORACLES_TAIL["doc_novelty_scores"] = _NOVELTY_SQL


# -- D5n: embedding hygiene audit ---------------------------------------------

def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-ANN hygiene: the distribution of embedding L2 norms (min /
    mean / max, rounded) plus counts of degenerate vectors (near-zero
    norm) and of vectors already unit-normalized — the audit that
    catches a mixed-normalization corpus BEFORE cosine math silently
    treats magnitude as relevance. Norms are computed JVM-side with
    the array higher-order fold (`aggregate`), no UDF; one scan, one
    1-row aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.aggregate(
        "embedding", F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))
    n = emb.select(norm.alias("nrm"))
    return n.agg(
        F.count("*").alias("n_vectors"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
        F.sum((F.col("nrm") < 1e-6).cast("long")).alias("n_degenerate"),
        F.sum((F.abs(F.col("nrm") - 1.0) < 1e-6).cast("long"))
        .alias("n_unit_normalized"))


_NORM_AUDIT_SQL = """
WITH n AS (SELECT sqrt(list_aggregate(
             list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))
             AS nrm
           FROM embeddings)
SELECT CAST(count(*) AS BIGINT) AS n_vectors,
       round(min(nrm), 6) AS min_norm,
       round(avg(nrm), 6) AS mean_norm,
       round(max(nrm), 6) AS max_norm,
       CAST(sum(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_degenerate,
       CAST(sum(CASE WHEN abs(nrm - 1.0) < 1e-6 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unit_normalized
FROM n
"""

QUERIES_TAIL["embedding_norm_audit"] = embedding_norm_audit
ORACLES_TAIL["embedding_norm_audit"] = _NORM_AUDIT_SQL


# -- D5o: character-entropy quality signal ------------------------------------

def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character-level Shannon entropy (nats) — the
    compression-proxy quality heuristic: near-zero entropy flags
    repeated-character junk and padded docs, unusually high entropy
    flags base64/binary blobs pasted into text; both ends are the
    standard pre-training drop candidates that token-level stats miss
    (a doc of one repeated WORD still has several distinct tokens).

    One char explode → (doc, char) counts → per-doc algebraic entropy
    Σ(c/n)·ln(n/c) in the entropy family's zero-UDF form; the doc
    length rolls off the same aggregate. Probabilities are
    integer-count ratios; the rounded sum is the one float output."""
    docs = load_table(spark, sf_dir, "documents")
    ch = (docs.select("doc_id",
                      F.explode(F.split(F.col("text"), "")).alias("ch"))
          .filter(F.col("ch") != ""))
    counts = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    tot = counts.groupBy("doc_id").agg(F.sum("c").alias("n"),
                                       F.count("*").alias("n_distinct"))
    j = counts.join(tot, "doc_id")
    ent = F.sum((F.col("c") / F.col("n"))
                * F.log(F.col("n") / F.col("c")))
    return (j.groupBy("doc_id", "n", "n_distinct")
            .agg(F.round(ent, 6).alias("char_entropy"))
            .select("doc_id", F.col("n").alias("n_chars_split"),
                    "n_distinct", "char_entropy"))


_CHAR_ENTROPY_SQL = """
WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
            FROM documents),
counts AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
           FROM ch WHERE ch <> '' GROUP BY 1, 2),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM counts GROUP BY 1)
SELECT counts.doc_id, n AS n_chars_split, n_distinct,
       round(sum((c * 1.0 / n) * ln(n * 1.0 / c)), 6) AS char_entropy
FROM counts JOIN tot USING (doc_id)
GROUP BY counts.doc_id, n, n_distinct
"""

QUERIES_TAIL["doc_char_entropy"] = doc_char_entropy
ORACLES_TAIL["doc_char_entropy"] = _CHAR_ENTROPY_SQL


# -- D5p: token co-occurrence PMI ---------------------------------------------

def token_pmi_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 token pairs by pointwise mutual information over
    document co-occurrence (PMI = ln(P(a,b)/(P(a)·P(b))), ≥ 20
    co-occurrences) — the collocation measure behind phrase mining and
    compound detection: high PMI says two tokens appear together far
    beyond their individual popularity.

    Baskets are DISTINCT tokens per doc; the a<b pair expansion
    unfolds map-side from the sorted basket array (the co-purchase
    shape — bounded by per-doc vocabulary², not corpus size);
    probabilities are integer document counts over one broadcast
    total. The cut orders by the ROUNDED PMI with count and pair
    tie-breaks."""
    docs = load_table(spark, sf_dir, "documents")
    baskets = (docs.select(
        "doc_id",
        F.array_sort(F.array_distinct(
            F.filter(F.split(F.col("text"), r"\s+"),
                     lambda t: t != ""))).alias("toks")))
    n_docs = float(docs.count())
    singles = (baskets.select(F.explode("toks").alias("token"))
               .groupBy("token").agg(F.count("*").alias("n_t")))
    pair_arr = F.flatten(F.transform(
        F.col("toks"),
        lambda x, i: F.transform(
            F.slice(F.col("toks"), i + F.lit(2), F.size(F.col("toks"))),
            lambda y: F.struct(x.alias("a"), y.alias("b")))))
    pairs = (baskets.select(F.explode(pair_arr).alias("p"))
             .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .agg(F.count("*").alias("n_ab"))
             .filter(F.col("n_ab") >= 20))
    pmi = F.log((F.col("n_ab") / F.lit(n_docs))
                / ((F.col("n_a") / F.lit(n_docs))
                   * (F.col("n_b") / F.lit(n_docs))))
    return (pairs
            .join(F.broadcast(singles.select(F.col("token").alias("a"),
                                             F.col("n_t").alias("n_a"))),
                  "a")
            .join(F.broadcast(singles.select(F.col("token").alias("b"),
                                             F.col("n_t").alias("n_b"))),
                  "b")
            .select("a", "b", "n_ab", F.round(pmi, 6).alias("pmi"))
            .orderBy(F.desc("pmi"), F.desc("n_ab"), F.asc("a"), F.asc("b"))
            .limit(20))


_PMI_SQL = r"""
WITH baskets AS (
  SELECT doc_id,
         list_sort(list_distinct(list_filter(
             string_split_regex(text, '\s+'), t -> t <> ''))) AS toks
  FROM documents),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
singles AS (SELECT token, CAST(count(*) AS BIGINT) AS n_t
            FROM (SELECT unnest(toks) AS token FROM baskets) u
            GROUP BY 1),
pairs AS (SELECT toks[i] AS a, toks[j] AS b,
                 CAST(count(*) AS BIGINT) AS n_ab
          FROM baskets,
               LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) ii,
               LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS j) jj
          WHERE i < j
          GROUP BY 1, 2
          HAVING count(*) >= 20)
SELECT a, b, n_ab,
       round(ln((n_ab / n) / ((sa.n_t / n) * (sb.n_t / n))), 6) AS pmi
FROM pairs
JOIN singles sa ON sa.token = a
JOIN singles sb ON sb.token = b
CROSS JOIN nd
ORDER BY pmi DESC, n_ab DESC, a ASC, b ASC
LIMIT 20
"""

QUERIES_TAIL["token_pmi_top20"] = token_pmi_top20
ORACLES_TAIL["token_pmi_top20"] = _PMI_SQL


# -- D5q: data-driven stopword density ----------------------------------------

_STOPWORD_K = 5


def stopword_density_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc stopword density against a DATA-DRIVEN stopword list —
    the corpus's own top-5 tokens by frequency (rank with a total
    tie-break, so the list is engine-identical) — plus a high-density
    flag (> 0.5): filler-heavy docs score high, content-dense docs
    low. Using the corpus's own head instead of a fixed English list
    keeps the signal language- and domain-agnostic — the practical
    form for a multilingual 100 TB corpus.

    One token agg builds the 5-row broadcast stopword list; a second
    scan computes per-doc totals and stopword hits in one conditional
    aggregate. Density is an integer-count ratio rounded once."""
    from pyspark.sql.window import Window as W
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select("doc_id",
                       F.explode(F.split(F.col("text"), r"\s+"))
                       .alias("token"))
           .filter(F.col("token") != ""))
    # top-K via sort+limit (TakeOrderedAndProject — per-partition
    # heaps), not a full-vocabulary row_number window (round-10 audit)
    top = (tok.groupBy("token").agg(F.count("*").alias("freq"))
           .orderBy(F.desc("freq"), F.asc("token"))
           .limit(_STOPWORD_K)
           .select("token", F.lit(1).alias("is_stop")))
    scored = (tok.join(F.broadcast(top), "token", "left")
              .groupBy("doc_id")
              .agg(F.count("*").alias("n_tokens"),
                   F.sum(F.coalesce(F.col("is_stop"), F.lit(0)))
                   .alias("n_stop")))
    density = F.col("n_stop") * 1.0 / F.col("n_tokens")
    return scored.select(
        "doc_id", "n_tokens", "n_stop",
        F.round(density, 6).alias("stopword_density"),
        F.when(F.round(density, 6) > 0.5, 1).otherwise(0)
        .alias("is_filler_heavy"))


_STOPWORD_SQL = rf"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token FROM tok WHERE token <> ''),
top AS (SELECT token, 1 AS is_stop FROM (
          SELECT token,
                 row_number() OVER (ORDER BY count(*) DESC, token ASC)
                   AS rk
          FROM tf GROUP BY token) t
        WHERE rk <= {_STOPWORD_K}),
scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                  CAST(sum(COALESCE(is_stop, 0)) AS BIGINT) AS n_stop
           FROM tf LEFT JOIN top USING (token)
           GROUP BY doc_id)
SELECT doc_id, n_tokens, n_stop,
       round(n_stop * 1.0 / n_tokens, 6) AS stopword_density,
       CASE WHEN round(n_stop * 1.0 / n_tokens, 6) > 0.5
            THEN 1 ELSE 0 END AS is_filler_heavy
FROM scored
"""

QUERIES_TAIL["stopword_density_scores"] = stopword_density_scores
ORACLES_TAIL["stopword_density_scores"] = _STOPWORD_SQL


# ---------------------------------------------------------------------------
# Round-7 wave: the retrieval leg of the corpus stack — a positional
# inverted index, phrase search over it, and the int8
# scalar-quantization audit that decides whether embeddings can ship
# at 1/4 storage. (Reference coverage: corpus/query surface of
# analyse_*.py; these are the beyond-reference LLM-pipeline operators
# the brief mandates.)
# ---------------------------------------------------------------------------

_POSTINGS_TOPN = 50
_POSTINGS_CAP = 8


def inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> document frequency, collection
    frequency, and the first ``_POSTINGS_CAP`` doc_ids of the posting
    list, for the ``_POSTINGS_TOPN`` highest-df tokens.

    Scale shape: one explode -> (token) hash agg, all map-combinable;
    posting lists are CAPPED (head segment only) because a full list
    for a stopword-grade token is O(corpus) — at 100 TB an index
    stores sharded posting segments keyed by (token, segment), which
    is this same agg bucketed by doc_id range. The cap keeps the
    registered output bounded at TOPN x CAP ids."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id", F.explode(F.split(F.col("text"), r"\s+"))
                   .alias("token"))
           .filter(F.col("token") != ""))
    return (tok.groupBy("token")
            .agg(F.countDistinct("doc_id").alias("df"),
                 F.count("*").alias("cf"),
                 F.array_join(
                     F.slice(F.array_sort(F.collect_set("doc_id")),
                             1, _POSTINGS_CAP), ",").alias("posting_head"))
            .orderBy(F.desc("df"), F.desc("cf"), "token")
            .limit(_POSTINGS_TOPN))


_POSTINGS_SQL = rf"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
             FROM documents),
tf AS (SELECT doc_id, token FROM tok WHERE token <> ''),
agg AS (SELECT token,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS cf,
               array_to_string(list_slice(list_sort(list(DISTINCT doc_id)),
                                          1, {_POSTINGS_CAP}), ',')
                 AS posting_head
        FROM tf GROUP BY token)
SELECT token, df, cf, posting_head
FROM agg
ORDER BY df DESC, cf DESC, token
LIMIT {_POSTINGS_TOPN}
"""

QUERIES_TAIL["inverted_postings"] = inverted_postings
ORACLES_TAIL["inverted_postings"] = _POSTINGS_SQL


_PHRASE_TOPN = 20


def phrase_search_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search over the positional index: find the corpus's most
    frequent bigram (adjacent token pair), then the documents that
    contain it with per-doc occurrence counts — the two-term
    AND-with-adjacency query every positional inverted index exists to
    answer.

    Scale shape: positions come from ONE posexplode; bigram discovery
    is a (doc, pos)->(doc, pos+1) equi-join aggregated map-side; the
    hit scan joins the 1-row broadcast phrase to the w1 postings
    FIRST (selectivity of the rarer term), then the positional
    adjacency equi-join against w2 postings — never a text rescan.
    All counts integer; top docs ordered (hits DESC, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs
           .select("doc_id",
                   F.posexplode(F.split(F.col("text"), r"\s+"))
                   .alias("pos", "token"))
           .filter(F.col("token") != ""))
    a, b = tok.alias("a"), tok.alias("b")
    adj = (a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
                  & (F.col("b.pos") == F.col("a.pos") + 1))
           .select(F.col("a.token").alias("w1"),
                   F.col("b.token").alias("w2")))
    top = (adj.groupBy("w1", "w2").agg(F.count("*").alias("n"))
           .orderBy(F.desc("n"), "w1", "w2").limit(1)
           .select("w1", "w2"))
    h1 = (tok.join(F.broadcast(top), F.col("token") == F.col("w1"))
          .select(F.col("doc_id").alias("h_doc"),
                  F.col("pos").alias("h_pos"), "w1", "w2"))
    hits = (h1.join(b, (F.col("b.doc_id") == F.col("h_doc"))
                    & (F.col("b.pos") == F.col("h_pos") + 1)
                    & (F.col("b.token") == F.col("w2")))
            .groupBy("h_doc", "w1", "w2")
            .agg(F.count("*").alias("hits")))
    return (hits.orderBy(F.desc("hits"), "h_doc")
            .limit(_PHRASE_TOPN)
            .select(F.col("h_doc").alias("doc_id"), "w1", "w2", "hits"))


_PHRASE_SQL = rf"""
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(text, '\s+')) AS token,
                    generate_subscripts(string_split_regex(text, '\s+'), 1)
                      - 1 AS pos
             FROM documents),
tf AS (SELECT doc_id, token, pos FROM tok WHERE token <> ''),
top AS (SELECT a.token AS w1, b.token AS w2
        FROM tf a JOIN tf b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY a.token, b.token
        ORDER BY count(*) DESC, w1, w2
        LIMIT 1)
SELECT a.doc_id, w1, w2, CAST(count(*) AS BIGINT) AS hits
FROM tf a JOIN top ON a.token = top.w1
JOIN tf b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         AND b.token = top.w2
GROUP BY a.doc_id, w1, w2
ORDER BY hits DESC, a.doc_id
LIMIT {_PHRASE_TOPN}
"""

QUERIES_TAIL["phrase_search_hits"] = phrase_search_hits
ORACLES_TAIL["phrase_search_hits"] = _PHRASE_SQL


def embedding_sq8_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization (SQ8) audit per embedding dimension:
    min/max scale, how many of the 256 codes the data actually uses,
    and the worst reconstruction error — the go/no-go table for
    shipping the ANN index at 1/4 storage (SQ8 is the standard
    vector-index compression; public knowledge, e.g. the IVF-SQ
    family).

    Cross-engine discipline: code = floor((x-min)/(max-min)*255 + .5)
    on the exact float64 widening of the stored float32 — every term
    is an IEEE-identical scalar expression, so codes match bit-for-bit
    and the only aggregates are min/max/countDistinct (all
    order-independent). Scale shape: one posexplode -> 64-group agg,
    broadcast of the 64-row scale table back onto the stream."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = (emb.select("vec_id",
                    F.posexplode("embedding").alias("dim", "xf"))
         .select("vec_id", F.col("dim").cast("int").alias("dim"),
                 F.col("xf").cast("double").alias("x")))
    mm = d.groupBy("dim").agg(F.min("x").alias("dmin"),
                              F.max("x").alias("dmax"))
    j = d.join(F.broadcast(mm), "dim")
    code = (F.when(F.col("dmax") == F.col("dmin"), F.lit(0))
            .otherwise(F.floor((F.col("x") - F.col("dmin"))
                               / (F.col("dmax") - F.col("dmin"))
                               * 255 + 0.5))).cast("int")
    j = j.withColumn("code", code)
    xhat = (F.col("dmin") + F.col("code").cast("double") / 255.0
            * (F.col("dmax") - F.col("dmin")))
    err = F.abs(F.col("x") - xhat)
    return (j.withColumn("err", err)
            .groupBy("dim")
            .agg(F.round(F.first("dmin"), 6).alias("dmin_q"),
                 F.round(F.first("dmax"), 6).alias("dmax_q"),
                 F.countDistinct("code").alias("codes_used"),
                 F.round(F.max("err"), 9).alias("max_abs_err"))
            .orderBy("dim"))


_SQ8_SQL = """
WITH d AS (SELECT vec_id,
                  CAST(unnest(embedding) AS DOUBLE) AS x,
                  CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim
           FROM embeddings),
mm AS (SELECT dim, min(x) AS dmin, max(x) AS dmax FROM d GROUP BY dim),
c AS (SELECT d.dim, x, dmin, dmax,
             CASE WHEN dmax = dmin THEN 0
                  ELSE CAST(floor((x - dmin) / (dmax - dmin) * 255 + 0.5)
                            AS INT) END AS code
      FROM d JOIN mm ON d.dim = mm.dim)
SELECT dim,
       round(dmin, 6) AS dmin_q,
       round(dmax, 6) AS dmax_q,
       CAST(count(DISTINCT code) AS BIGINT) AS codes_used,
       round(max(abs(x - (dmin + code / 255.0 * (dmax - dmin)))), 9)
         AS max_abs_err
FROM c
GROUP BY dim, dmin, dmax
ORDER BY dim
"""

QUERIES_TAIL["embedding_sq8_audit"] = embedding_sq8_audit
ORACLES_TAIL["embedding_sq8_audit"] = _SQ8_SQL


# -- D5r: reciprocal-rank fusion — hybrid lexical+semantic retrieval ----------

_RRF_K = 60      # the standard RRF constant (Cormack/Clarke/Buettcher 2009)
_RRF_DEPTH = 50  # per-ranker candidate depth before fusion
_RRF_TOPN = 10


def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (public knowledge —
    Cormack/Clarke/Buettcher SIGIR 2009; the fusion every BM25+vector
    stack ships): for each of 8 query items, fuse a LEXICAL ranking
    (rarity-weighted distinct-token overlap between the query document
    and every candidate document) with a SEMANTIC ranking (exact
    cosine between the query embedding and every candidate embedding)
    as rrf = 1/(K + r_lex) + 1/(K + r_sem), each list truncated at
    depth 50, K = 60; emit the fused top-10 per query. The synthetic
    corpus aligns ``embeddings.vec_id`` with ``documents.doc_id``
    (both 0..N-1 over the same N), so hybrid search treats them as
    one item id.

    Exactness: the lexical score is the INTEGER rarity weight
    sum(N - df) over shared distinct tokens — monotone in idf but
    float-free, so lexical ranks are engine-identical by construction;
    semantic ranks order by the round-6 cosine (cosine_topk
    precedent); rrf_raw is a fixed-order sum of two exact reciprocals
    of integer ranks (IEEE-identical), rounded only at emission.
    Every rank window tie-breaks on item id.

    Scale shape: the lexical side is the inverted-index join — the
    distinct (doc, token) posting set built by one explode + hash agg,
    df attached to the 8 query token-sets FIRST (vocab-grain join on
    the tiny side), then ONE broadcast join onto the postings and an
    integer agg; the semantic side is scan → broadcast-nested-loop
    over the 8 queries (brute-force baseline — ivf_ann_topk /
    lsh_ann_topk are the registered subquadratic swaps). Fusion is a
    full outer join of two |Q|*depth frames and a |Q|-partitioned
    window — bounded by the constants, never by the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = (docs.select("doc_id",
                        F.explode(F.split("text", r"\s+")).alias("token"))
            .filter(F.col("token") != "").distinct())
    dfreq = toks.groupBy("token").agg(F.count("*").alias("df"))
    qtok = (toks.filter(F.col("doc_id") < 8)
            .select(F.col("doc_id").alias("q_id"), "token")
            .join(dfreq, "token")
            .localCheckpoint())  # tiny; cuts the postings re-scan per branch
    lex = (toks.join(F.broadcast(qtok), "token")
           .filter(F.col("doc_id") != F.col("q_id"))
           .groupBy("q_id", "doc_id")
           .agg(F.sum(F.lit(n_docs).cast("long") - F.col("df"))
                .alias("lex_w")))
    wl = Window.partitionBy("q_id").orderBy(F.desc("lex_w"), F.asc("doc_id"))
    lex_top = (lex.withColumn("r_lex", F.row_number().over(wl))
               .filter(F.col("r_lex") <= _RRF_DEPTH)
               .select("q_id", F.col("doc_id").alias("item_id"), "r_lex"))

    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
           .withColumn("nv", norm(F.col("v"))))
    qv = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), F.col("v").alias("q_v"),
                  F.col("nv").alias("nq")))
    dot = F.aggregate(F.zip_with("v", "q_v", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    sem = (emb.crossJoin(F.broadcast(qv))
           .filter(F.col("vec_id") != F.col("q_id"))
           .select("q_id", "vec_id",
                   F.round(dot / (F.col("nv") * F.col("nq")), 6)
                   .alias("cos")))
    ws = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    sem_top = (sem.withColumn("r_sem", F.row_number().over(ws))
               .filter(F.col("r_sem") <= _RRF_DEPTH)
               .select("q_id", F.col("vec_id").alias("item_id"), "r_sem"))

    fused = (lex_top.join(sem_top, ["q_id", "item_id"], "full_outer")
             .select("q_id", "item_id", "r_lex", "r_sem",
                     (F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_lex")),
                                 F.lit(0.0))
                      + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("r_sem")),
                                   F.lit(0.0))).alias("rrf_raw")))
    wf = Window.partitionBy("q_id").orderBy(F.desc("rrf_raw"),
                                            F.asc("item_id"))
    return (fused.withColumn("rank", F.row_number().over(wf))
            .filter(F.col("rank") <= _RRF_TOPN)
            .select("q_id", "item_id", F.round("rrf_raw", 6).alias("rrf"),
                    "r_lex", "r_sem", "rank"))


_RRF_SQL = rf"""
WITH tok0 AS (SELECT doc_id,
                     unnest(string_split_regex(text, '\s+')) AS token
              FROM documents),
toks AS (SELECT DISTINCT doc_id, token FROM tok0 WHERE token <> ''),
dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df
          FROM toks GROUP BY token),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
qtok AS (SELECT t.doc_id AS q_id, t.token, d.df
         FROM toks t JOIN dfreq d USING (token) WHERE t.doc_id < 8),
lex AS (SELECT q.q_id, t.doc_id AS item_id,
               sum(n.n_docs - q.df) AS lex_w
        FROM toks t JOIN qtok q USING (token) CROSS JOIN n
        WHERE t.doc_id <> q.q_id GROUP BY q.q_id, t.doc_id),
lex_top AS (SELECT q_id, item_id, r_lex FROM (
    SELECT q_id, item_id,
           CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY lex_w DESC, item_id ASC) AS INT) AS r_lex
    FROM lex) t WHERE r_lex <= {_RRF_DEPTH}),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_v FROM emb WHERE vec_id < 8),
sem AS (SELECT q_id, vec_id AS item_id,
               round(list_dot_product(v, q_v)
                     / (sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(q_v, q_v))), 6) AS cos
        FROM emb CROSS JOIN q WHERE vec_id <> q_id),
sem_top AS (SELECT q_id, item_id, r_sem FROM (
    SELECT q_id, item_id,
           CAST(row_number() OVER (PARTITION BY q_id
                ORDER BY cos DESC, item_id ASC) AS INT) AS r_sem
    FROM sem) t WHERE r_sem <= {_RRF_DEPTH}),
fused AS (SELECT coalesce(l.q_id, s.q_id) AS q_id,
                 coalesce(l.item_id, s.item_id) AS item_id,
                 l.r_lex, s.r_sem,
                 coalesce(1.0 / ({_RRF_K} + l.r_lex), 0.0)
                   + coalesce(1.0 / ({_RRF_K} + s.r_sem), 0.0) AS rrf_raw
          FROM lex_top l
          FULL OUTER JOIN sem_top s
            ON l.q_id = s.q_id AND l.item_id = s.item_id)
SELECT q_id, item_id, round(rrf_raw, 6) AS rrf, r_lex, r_sem, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
             ORDER BY rrf_raw DESC, item_id ASC) AS INT) AS rank
  FROM fused) t
WHERE rank <= {_RRF_TOPN}
"""

QUERIES_TAIL["rrf_hybrid_search"] = rrf_hybrid_search
ORACLES_TAIL["rrf_hybrid_search"] = _RRF_SQL


# -- D-tail: containment near-dups (asymmetric overlap) ------------------------

_CONT_DF_CAP = 64     # stop-shingle prune: drop shingles in > CAP docs
_CONT_MIN = 0.6       # emit pairs at/above this overlap coefficient


def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-duplication via the OVERLAP COEFFICIENT
    |A∩B| / min(|A|,|B|) over 3-gram shingle sets — the containment
    measure (Broder 1997's resemblance/containment pair) that catches
    a short document embedded inside a longer one, which Jaccard
    dilutes toward 0 as the length gap grows (the quote/boilerplate/
    subset case every dedup pass must handle separately from
    symmetric near-dup).

    Operator definition includes a STOP-SHINGLE prune: shingles
    appearing in more than 64 documents are dropped before pairing
    (both set sizes and intersections count pruned sets — the oracle
    replays the same prune). That bounds each shingle's pair fan-out
    at O(CAP^2) regardless of corpus density — the adjacency-cap
    lesson from link_prediction_top20 applied to the dedup family;
    ubiquitous boilerplate shingles are exactly the ones that carry
    no duplication signal.

    Regime boundary (measured at the 100x soak, stated not hidden):
    a corpus whose every document is >CAP-way duplicated prunes ALL
    shingles and yields zero containment pairs — by design. Mass
    duplication is the exact/MinHash families' regime (they stay
    recall-complete at the same soaks); containment targets the
    asymmetric subset case in the deduplicated tail, and the absolute
    cap is what keeps its fan-out scale-safe.

    Scale shape: shingle build (one explode, array ops, no UDF) ->
    df agg -> semi-join prune -> shingle-equi-join bounded by the cap
    -> pair agg -> two broadcast size joins. The checkpointed shingle
    frame feeds its three consumers (df, sizes, join) one
    materialization."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingles(docs).localCheckpoint()
    keep = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
            .filter(F.col("df") <= _CONT_DF_CAP)
            .select("shingle"))
    # NOT pinned (tried in r12, measured 2.46 -> 3.21 s): the pruned
    # frame is ~|shingle| string rows, and storing it costs more than
    # replaying the prune join over the pinned `sh` — pinning pays only
    # when the replayed lineage exceeds the stored bytes (guide §5)
    pruned = sh.join(keep, "shingle")
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = pruned.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = pruned.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").alias("n_inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    return (inter.join(F.broadcast(sa), "doc_a")
            .join(F.broadcast(sb), "doc_b")
            .withColumn("overlap_coef",
                        F.round(F.col("n_inter").cast("double")
                                / F.least("n_a", "n_b"), 6))
            .filter(F.col("overlap_coef") >= _CONT_MIN)
            .select("doc_a", "doc_b", "n_a", "n_b", "n_inter",
                    "overlap_coef")
            .orderBy("doc_a", "doc_b"))


_CONTAINMENT_SQL = rf"""
WITH w AS (SELECT doc_id, string_split_regex(text, '\s+') AS wds
           FROM documents),
sh0 AS (SELECT DISTINCT doc_id,
               wds[i] || ' ' || wds[i+1] || ' ' || wds[i+2] AS shingle
        FROM w, LATERAL (SELECT unnest(range(1, len(wds) - 1)) AS i) ix),
keep AS (SELECT shingle FROM sh0
         GROUP BY shingle HAVING count(*) <= {_CONT_DF_CAP}),
sh AS (SELECT doc_id, shingle FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
          FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(count(*) AS BIGINT) AS n_inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_inter,
       round(CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6)
         AS overlap_coef
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= {_CONT_MIN}
ORDER BY doc_a, doc_b
"""

QUERIES_TAIL["containment_near_dups"] = containment_near_dups
ORACLES_TAIL["containment_near_dups"] = _CONTAINMENT_SQL


# -- D-tail: MMR-diversified retrieval (applyInPandas custom operator) --------

_MMR_LAMBDA = 0.7          # documented objective weight...
_MMR_W_REL = round(_MMR_LAMBDA * 10)        # ...enforced via these
_MMR_W_SIM = 10 - _MMR_W_REL                # exact integer weights
_MMR_CAND = 50
_MMR_TOPN = 10


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (public knowledge —
    Carbonell & Goldstein SIGIR 1998): after the distributed retriever
    produces each query's top-50 cosine candidates, greedily select 10
    maximizing lambda*rel(d) - (1-lambda)*max_{s in S} sim(d, s) —
    the diversity-aware re-rank every RAG/search stack applies when
    near-duplicate hits crowd out coverage.

    Architecture split (the custom-operator recipe): candidate
    GENERATION is the scan -> broadcast-nested-loop -> per-query
    window — fully distributed, JVM-side, and swaps for ivf/lsh ANN
    at scale; the greedy SELECTION is inherently sequential in the
    selected set, so it runs as `applyInPandas` over q_id groups —
    each group a BOUNDED 50-row frame with unit-normalized vectors,
    Arrow-batched, embarrassingly parallel across queries. The
    quadratic (50x50 GEMM) is capped by the candidate constant, never
    by the corpus.

    Cross-engine exactness (what makes the greedy ORACLE-BACKED
    despite being iterative): relevance and candidate-candidate
    cosines are quantized to ppb INTEGERS with floor() — identical
    doubles in, identical integers out — and the MMR objective
    0.7·rel − 0.3·max_sim becomes the exact integer
    7·rel_ppb − 3·max_sim_ppb (score scale ×10⁹·10). The kernel
    accumulates every dot product in DIMENSION ORDER (elementwise adds
    starting from 0.0), bit-matching the oracle's left-associated
    unrolled sums, so argmax decisions agree exactly; ties pick the
    smallest item_id in both. The oracle replays the greedy as a
    DuckDB recursive CTE carrying the picked set as a LIST column.
    A pure-numpy rederivation test additionally pins the Arrow/
    grouping mechanics (tests/test_retrieval_eval.py)."""
    import numpy as np
    import pandas as pd

    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    emb = (load_table(spark, sf_dir, "embeddings")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("v"))
           .withColumn("nv", norm(F.col("v")))
           .withColumn("u", F.transform("v", lambda x: x / F.col("nv")))
           .drop("v"))
    qv = (emb.filter(F.col("vec_id") < 8)
          .select(F.col("vec_id").alias("q_id"), F.col("u").alias("q_u")))
    dot = F.aggregate(F.zip_with("u", "q_u", lambda x, y: x * y),
                      F.lit(0.0), lambda a, x: a + x)
    scored = (emb.crossJoin(F.broadcast(qv))
              .filter(F.col("vec_id") != F.col("q_id"))
              .select("q_id", F.col("vec_id").alias("item_id"),
                      F.round(dot, 6).alias("relevance"), "u"))
    w = Window.partitionBy("q_id").orderBy(F.desc("relevance"),
                                           F.asc("item_id"))
    cand = (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _MMR_CAND)
            .select("q_id", "item_id", "relevance", "u"))

    out_schema = ("q_id long, item_id long, relevance double, "
                  "mmr_ppb10 long, mmr_rank int")

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("item_id").reset_index(drop=True)
        V = np.stack(pdf["u"].to_numpy())          # (n, d), unit rows
        n, dim = V.shape
        sims = np.zeros((n, n))                     # dimension-ordered
        for dd in range(dim):                       # adds == the SQL
            sims = sims + np.outer(V[:, dd], V[:, dd])  # unrolled sum
        sim_ppb = np.floor(sims * 1e9).astype(np.int64)
        rel = pdf["relevance"].to_numpy()
        rel_ppb = np.floor(rel * 1e9).astype(np.int64)
        chosen: list[int] = []
        scores: list[int] = []
        # running max STARTS AT 0: the diversity penalty is
        # max(0, max sim-to-picked) — negative similarity never turns
        # into a bonus (the oracle mirrors with greatest(..., 0))
        max_sim = np.zeros(n, dtype=np.int64)
        for step in range(min(_MMR_TOPN, n)):
            mmr = _MMR_W_REL * rel_ppb - _MMR_W_SIM * max_sim
            mmr[chosen] = np.iinfo(np.int64).min
            pick = int(np.argmax(mmr))              # first max = min id
            chosen.append(pick)
            scores.append(int(mmr[pick]))
            max_sim = np.maximum(max_sim, sim_ppb[:, pick])
        sel = pdf.iloc[chosen]
        return pd.DataFrame({
            "q_id": sel["q_id"].to_numpy(),
            "item_id": sel["item_id"].to_numpy(),
            "relevance": sel["relevance"].to_numpy(),
            "mmr_ppb10": np.array(scores, dtype=np.int64),
            "mmr_rank": np.arange(1, len(chosen) + 1, dtype="int32"),
        })

    return (cand.groupBy("q_id").applyInPandas(greedy, out_schema)
            .orderBy("q_id", "mmr_rank"))


_EMB_DIM = 64


def _mmr_sql() -> str:
    """Oracle: the SAME greedy in DuckDB — unit vectors and rounded
    relevance replayed with left-associated unrolled sums, ppb-floor
    quantization, then a recursive CTE that carries the picked set as
    a LIST and takes each step's argmax via a struct max (numer DESC,
    item_id ASC)."""
    d = range(1, _EMB_DIM + 1)
    sq = " + ".join(f"CAST(embedding[{i}] AS DOUBLE)"
                    f"*CAST(embedding[{i}] AS DOUBLE)" for i in d)
    reldot = " + ".join(f"e.u[{i}]*q.q_u[{i}]" for i in d)
    simdot = " + ".join(f"a.u[{i}]*b.u[{i}]" for i in d)
    return f"""WITH RECURSIVE
u AS MATERIALIZED (SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) / sqrt(0.0 + {sq}))
               AS u
      FROM embeddings),
q AS (SELECT vec_id AS q_id, u AS q_u FROM u WHERE vec_id < 8),
scored AS MATERIALIZED (SELECT q.q_id, e.vec_id AS item_id,
                  round(0.0 + {reldot}, 6) AS relevance, e.u AS u
           FROM u e CROSS JOIN q WHERE e.vec_id <> q.q_id),
cand AS MATERIALIZED (SELECT q_id, item_id, relevance, u,
                CAST(floor(relevance * 1e9) AS BIGINT) AS rel_ppb
         FROM (SELECT *, row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY relevance DESC, item_id ASC) AS rk
               FROM scored) t WHERE rk <= {_MMR_CAND}),
sims AS MATERIALIZED (SELECT a.q_id, a.item_id AS a_id, b.item_id AS b_id,
                CAST(floor((0.0 + {simdot}) * 1e9) AS BIGINT) AS sim_ppb
         FROM cand a JOIN cand b
           ON a.q_id = b.q_id AND a.item_id <> b.item_id),
rec AS (
  SELECT q_id, 0 AS step, CAST([] AS BIGINT[]) AS picked,
         CAST(NULL AS BIGINT) AS item_id,
         CAST(NULL AS BIGINT) AS mmr_ppb10,
         CAST(NULL AS DOUBLE) AS relevance
  FROM (SELECT DISTINCT q_id FROM cand) t
  UNION ALL
  SELECT o.q_id, o.step + 1, list_append(o.picked, -(o.best.ni)),
         -(o.best.ni), o.best.n, o.best.r
  FROM (
    SELECT i.q_id, i.step, i.picked,
           max(struct_pack(n := i.numer, ni := -i.item_id,
                           r := i.relevance)) AS best
    FROM (
      SELECT r.q_id, r.step, r.picked, c.item_id, c.relevance,
             {_MMR_W_REL}*c.rel_ppb
               - {_MMR_W_SIM}*greatest(coalesce(max(s.sim_ppb),
                                         CAST(0 AS BIGINT)),
                            CAST(0 AS BIGINT)) AS numer
      FROM rec r
      JOIN cand c ON c.q_id = r.q_id
                 AND NOT list_contains(r.picked, c.item_id)
      LEFT JOIN sims s ON s.q_id = c.q_id AND s.a_id = c.item_id
                      AND list_contains(r.picked, s.b_id)
      WHERE r.step < {_MMR_TOPN}
      GROUP BY r.q_id, r.step, r.picked, c.item_id, c.relevance,
               c.rel_ppb
    ) i
    GROUP BY i.q_id, i.step, i.picked
  ) o
)
SELECT q_id, item_id, relevance, mmr_ppb10, CAST(step AS INT) AS mmr_rank
FROM rec WHERE step >= 1
ORDER BY q_id, mmr_rank
"""


QUERIES_TAIL["mmr_diversified_topk"] = mmr_diversified_topk
ORACLES_TAIL["mmr_diversified_topk"] = _mmr_sql()


# -- D26: readability scoring (Flesch family, exact integer counts) ----------

def readability_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch-Kincaid grade / Flesch reading-ease panel —
    the classic curation signal for "is this corpus slice written at
    the complexity we want?". Deterministic surrogates (house rule:
    no dictionary, no float parsing): words = maximal [a-z]+ runs,
    syllables = maximal vowel-group [aeiouy]+ runs, sentences =
    [.!?]+ runs floored at 1 per doc (the synthetic corpus carries no
    terminal punctuation, so every doc counts 1 — the formula is
    still the real one and lights up on punctuated corpora).

    Exactness: the three counts are BIGINTs from identical regexes in
    both engines; each formula is one scalar IEEE expression over the
    per-source sums, rounded once.

    Scale shape: map-side regexp_count per row (whole-stage codegen,
    no UDF), one per-source hash agg. Nothing shuffles but the
    per-source triples."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.regexp_count("text", F.lit("[a-z]+")).cast("long").alias("w"),
        F.regexp_count("text", F.lit("[aeiouy]+")).cast("long").alias("y"),
        F.greatest(F.lit(1), F.regexp_count("text", F.lit("[.!?]+")))
        .cast("long").alias("s"))
    agg = per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("w").alias("words"), F.sum("s").alias("sentences"),
        F.sum("y").alias("syllables"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    wps = d("words") / d("sentences")
    ypw = d("syllables") / d("words")
    return (agg.select(
        "source", "n_docs", "words", "sentences", "syllables",
        F.round(0.39 * wps + 11.8 * ypw - 15.59, 6).alias("fk_grade"),
        F.round(206.835 - 1.015 * wps - 84.6 * ypw, 6)
        .alias("flesch_ease"))
        .orderBy("source"))


_READABILITY_SQL = """
WITH per AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS y,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
              AS BIGINT) AS s
  FROM documents),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(w) AS BIGINT) AS words,
         CAST(sum(s) AS BIGINT) AS sentences,
         CAST(sum(y) AS BIGINT) AS syllables
  FROM per GROUP BY source)
SELECT source, n_docs, words, sentences, syllables,
       round(0.39 * (CAST(words AS DOUBLE) / sentences)
             + 11.8 * (CAST(syllables AS DOUBLE) / words) - 15.59, 6)
         AS fk_grade,
       round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
             - 84.6 * (CAST(syllables AS DOUBLE) / words), 6)
         AS flesch_ease
FROM agg
ORDER BY source
"""

QUERIES_TAIL["readability_report"] = readability_report
ORACLES_TAIL["readability_report"] = _READABILITY_SQL


# -- D27: boilerplate screen via shared document prefixes --------------------

def template_prefix_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template screen: documents sharing an identical
    8-token PREFIX are near-certain template copies (the cheap
    precursor to MinHash — crawl pipelines run it first because it is
    one hash per doc). Emits every prefix shared by ≥2 docs with its
    doc count, the canonical representative (min doc_id), and how many
    of the copies are byte-identical overall — separating true
    duplicates from template-with-different-tail docs.

    Exactness: prefix = literal first-8-token string (single-space
    tokenization, same split both engines); all counts BIGINT.

    Scale shape: one map-side prefix projection, one hash groupBy on
    the prefix (the classic skew caveat — a viral boilerplate prefix
    is one hot key — is bounded here by the ≥2 HAVING filter running
    AFTER map-side partial aggregation). No joins, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    pre = docs.select(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
        .alias("prefix"),
        "doc_id",
        F.md5(F.col("text")).alias("full_hash"))
    return (pre.groupBy("prefix")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("rep_doc"),
                 F.countDistinct("full_hash").alias("n_distinct_texts"))
            .filter(F.col("n_docs") >= 2)
            .orderBy(F.desc("n_docs"), "prefix"))


_PREFIX_SQL = """
WITH pre AS (
  SELECT array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')
           AS prefix,
         doc_id, md5(text) AS full_hash
  FROM documents)
SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS rep_doc,
       CAST(count(DISTINCT full_hash) AS BIGINT) AS n_distinct_texts
FROM pre
GROUP BY prefix
HAVING count(*) >= 2
ORDER BY n_docs DESC, prefix
"""

QUERIES_TAIL["template_prefix_dups"] = template_prefix_dups
ORACLES_TAIL["template_prefix_dups"] = _PREFIX_SQL


# -- D6b: REAL media decode over planted binary fixtures ----------------------

def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media decode, end to end: plant one deterministic
    blob per document (BMP / PPM / WAV cycling by doc_id, pure integer
    pixel/sample patterns), ship the binary column through Arrow, then
    PARSE it back with the lib-free struct+numpy codecs
    (operators/multimodal.py: decode_bmp handles bottom-up rows, BGR
    order and 4-byte row padding; decode_wav walks RIFF chunks) and
    emit per-blob statistics computed from the decoded bytes only.

    The oracle replays every statistic in closed form from the
    planting pattern — any drift in the encoder, the Arrow transport,
    or the parser (padding, row order, channel order, chunk sizes)
    breaks the hash. Two mapInPandas stages, partition-parallel, no
    driver collect: the shape a real 100-TB media table needs (swap
    the planted blobs for parquet-stored bytes and the decode kernel
    for Pillow/pyav; everything else stands)."""
    from threat_detection_nosql_spark.operators.multimodal import (
        media_stats, synth_media)
    docs = load_table(spark, sf_dir, "documents")
    return media_stats(synth_media(docs))


# Closed-form replay of the planted patterns (operators/multimodal.py
# _synth_blob): bmp pixel[r,c,k] = base+r+16k+(c%4) over (8 x 4+id%5);
# ppm pixel[r,c,k] = base+c+32k over (6 x 3+id%7); wav s[i] =
# base+7*(i%40) over n = 64+id%100 samples. All sums are exact integer
# arithmetic -- no floats anywhere in this query.
_MEDIA_FEATURES_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 3 AS kind,
         4 + doc_id % 5 AS bw, 3 + doc_id % 7 AS pw,
         doc_id % 180 AS bbase, doc_id % 180 AS pbase,
         doc_id % 1000 AS wbase, 64 + doc_id % 100 AS n
  FROM documents)
SELECT doc_id,
       CASE WHEN kind = 0 THEN 'bmp' WHEN kind = 1 THEN 'ppm'
            ELSE 'wav' END AS media_kind,
       CAST(CASE WHEN kind = 0 THEN bw WHEN kind = 1 THEN pw END
            AS INT) AS width,
       CAST(CASE WHEN kind = 0 THEN 8 WHEN kind = 1 THEN 6 END
            AS INT) AS height,
       CAST(CASE WHEN kind <= 1 THEN 3 END AS INT) AS n_channels,
       CAST(CASE WHEN kind = 0 THEN 8*bw*bbase + 28*bw
                      + 8*(6*(bw//4) + (bw%4)*((bw%4)-1)//2)
                 WHEN kind = 1 THEN 6*pw*pbase + 3*pw*(pw-1)
            END AS BIGINT) AS pixel_sum_c0,
       CAST(CASE WHEN kind = 0 THEN 8*bw*bbase + 28*bw
                      + 8*(6*(bw//4) + (bw%4)*((bw%4)-1)//2) + 128*bw
                 WHEN kind = 1 THEN 6*pw*pbase + 3*pw*(pw-1) + 192*pw
            END AS BIGINT) AS pixel_sum_c1,
       CAST(CASE WHEN kind = 0 THEN 8*bw*bbase + 28*bw
                      + 8*(6*(bw//4) + (bw%4)*((bw%4)-1)//2) + 256*bw
                 WHEN kind = 1 THEN 6*pw*pbase + 3*pw*(pw-1) + 384*pw
            END AS BIGINT) AS pixel_sum_c2,
       CAST(CASE WHEN kind = 2 THEN n END AS BIGINT) AS n_samples,
       CAST(CASE WHEN kind = 2 THEN 8000 + (doc_id % 4) * 4000 END
            AS INT) AS sample_rate,
       CAST(CASE WHEN kind = 2 THEN n*wbase
                      + 7*(780*(n//40) + (n%40)*((n%40)-1)//2)
            END AS BIGINT) AS sample_sum,
       CAST(CASE WHEN kind = 2 THEN wbase + 273 END AS INT)
         AS sample_peak
FROM d
"""

QUERIES_TAIL["media_decode_stats"] = media_decode_stats
ORACLES_TAIL["media_decode_stats"] = _MEDIA_FEATURES_SQL


# -- D6c: frame-level audio features over decoded PCM --------------------------

def audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio statistics from REAL decoded PCM: plant the
    deterministic WAV blobs, parse them back (RIFF walk + int16
    samples), window into 32-sample frames, and emit exact-integer
    energy/peak/slope features per frame — the lib-free skeleton of
    every VAD/onset pipeline. The oracle never touches the bytes: it
    regenerates each doc's sample series with unnest(generate_series),
    applies the SAME framing, and computes rises with a lag window —
    so the decode path is checked against an independent formulation
    of the feature definitions, not a copy of the kernel."""
    from threat_detection_nosql_spark.operators.multimodal import (
        audio_frame_features as frames, synth_media)
    docs = load_table(spark, sf_dir, "documents")
    return frames(synth_media(docs))


_AUDIO_FRAMES_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 1000 AS base, 64 + doc_id % 100 AS n
  FROM documents WHERE doc_id % 3 = 2),
s0 AS (
  SELECT doc_id, base, unnest(generate_series(0, n - 1)) AS i FROM d),
s AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         CAST(base + 7 * (i % 40) AS BIGINT) AS v
  FROM s0),
lagged AS (
  SELECT doc_id, i // 32 AS frame_idx, v,
         lag(v) OVER (PARTITION BY doc_id, i // 32 ORDER BY i) AS pv
  FROM s)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(count(*) AS INT) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(sum(v * v) AS BIGINT) AS sample_sumsq,
       CAST(max(v) AS INT) AS frame_peak,
       CAST(sum(CASE WHEN pv IS NOT NULL AND v > pv THEN 1 ELSE 0 END)
            AS INT) AS n_rises
FROM lagged
GROUP BY doc_id, frame_idx
"""

QUERIES_TAIL["audio_frame_features"] = audio_frame_features
ORACLES_TAIL["audio_frame_features"] = _AUDIO_FRAMES_SQL


# -- D6d: image tile/patch statistics over decoded pixels ----------------------

def image_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style patching over REAL decoded pixels (BMP padding +
    bottom-up rows and PPM raster both exercised): 4x4 tiles,
    exact-integer per-channel sums. Oracle regenerates the pixel
    lattice (two sequential unnest(generate_series) CTEs — they zip
    if stacked in one SELECT) and replays the same tiling without
    touching the bytes."""
    from threat_detection_nosql_spark.operators.multimodal import (
        image_tile_stats as tiles, synth_media)
    docs = load_table(spark, sf_dir, "documents")
    return tiles(synth_media(docs))


_IMAGE_TILES_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 3 AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 4 + doc_id % 5
              ELSE 3 + doc_id % 7 END AS w,
         CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 6 END AS h,
         doc_id % 180 AS base
  FROM documents WHERE doc_id % 3 IN (0, 1)),
rws AS (
  SELECT doc_id, kind, w, base,
         unnest(generate_series(0, h - 1)) AS r
  FROM d),
px AS (
  SELECT doc_id, kind, base, r,
         unnest(generate_series(0, w - 1)) AS c
  FROM rws),
v AS (
  SELECT doc_id, r // 4 AS tile_r, c // 4 AS tile_c,
         CASE WHEN kind = 0 THEN base + r + c % 4
              ELSE base + c END AS v0,
         CASE WHEN kind = 0 THEN 16 ELSE 32 END AS step
  FROM px)
SELECT doc_id, CAST(tile_r AS INT) AS tile_r,
       CAST(tile_c AS INT) AS tile_c,
       CAST(count(*) AS INT) AS n_px,
       CAST(sum(v0) AS BIGINT) AS sum_c0,
       CAST(sum(v0 + step) AS BIGINT) AS sum_c1,
       CAST(sum(v0 + 2 * step) AS BIGINT) AS sum_c2
FROM v
GROUP BY doc_id, tile_r, tile_c
"""

QUERIES_TAIL["image_tile_stats"] = image_tile_stats
ORACLES_TAIL["image_tile_stats"] = _IMAGE_TILES_SQL


# -- D6e: image resize (stride decimation) over decoded pixels -----------------

def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize slot of a vision preprocessing pipeline over REAL
    decoded pixels: stride-2 decimation (nearest-neighbor downsample)
    of each planted BMP/PPM, emitting output dimensions and exact
    per-channel sums of the kept pixels. Oracle regenerates the pixel
    lattice and keeps only even rows/columns — any drift in decode
    (padding, bottom-up rows, channel order) or the decimation
    arithmetic breaks the hash."""
    from threat_detection_nosql_spark.operators.multimodal import (
        downsample_image_stats, synth_media)
    docs = load_table(spark, sf_dir, "documents")
    return downsample_image_stats(synth_media(docs), stride=2)


_RESIZE_SQL = """
WITH d AS (
  SELECT doc_id, doc_id % 3 AS kind,
         CASE WHEN doc_id % 3 = 0 THEN 4 + doc_id % 5
              ELSE 3 + doc_id % 7 END AS w,
         CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 6 END AS h,
         doc_id % 180 AS base
  FROM documents WHERE doc_id % 3 IN (0, 1)),
rws AS (
  SELECT doc_id, kind, w, h, base,
         unnest(generate_series(0, h - 1, 2)) AS r
  FROM d),
px AS (
  SELECT doc_id, kind, w, h, base, r,
         unnest(generate_series(0, w - 1, 2)) AS c
  FROM rws),
v AS (
  SELECT doc_id, kind, w, h,
         CASE WHEN kind = 0 THEN base + r + c % 4
              ELSE base + c END AS v0,
         CASE WHEN kind = 0 THEN 16 ELSE 32 END AS step
  FROM px)
SELECT doc_id,
       CASE WHEN kind = 0 THEN 'bmp' ELSE 'ppm' END AS media_kind,
       CAST((h + 1) // 2 AS INT) AS out_h,
       CAST((w + 1) // 2 AS INT) AS out_w,
       CAST(sum(v0) AS BIGINT) AS sum_c0,
       CAST(sum(v0 + step) AS BIGINT) AS sum_c1,
       CAST(sum(v0 + 2 * step) AS BIGINT) AS sum_c2
FROM v
GROUP BY doc_id, kind, w, h
"""

QUERIES_TAIL["media_resize_stats"] = media_resize_stats
ORACLES_TAIL["media_resize_stats"] = _RESIZE_SQL


# -- D6f: GIF decode — the compressed-codec path (round 9) ---------------------

def gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode of a COMPRESSED format: plant one GIF87a per
    document (from-scratch variable-width LZW encoder,
    operators/multimodal.py), ship the compressed bytes through Arrow,
    parse them back with the independent decoder (header walk,
    sub-block reassembly, LZW with the decoder-side width schedule,
    palette lookup) and emit exact per-channel pixel sums. The oracle
    never touches the bytes: it regenerates the planted index lattice
    idx=(base+r+c)%8 and linear palette 16i+32k+5 with generate_series
    — so every LZW bit (clear/EOI codes, LSB packing, the 2^w−1
    decoder widen rule) is pinned by the hash."""
    from threat_detection_nosql_spark.operators.multimodal import (
        gif_decode_stats as stats, synth_gif_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_gif_media(docs))


_GIF_STATS_SQL = """
WITH d AS (
  SELECT doc_id, 5 + doc_id % 6 AS w, 7 AS h, doc_id % 8 AS base
  FROM documents),
rws AS (
  SELECT doc_id, w, base, unnest(generate_series(0, h - 1)) AS r
  FROM d),
px AS (
  SELECT doc_id, base, r, unnest(generate_series(0, w - 1)) AS c
  FROM rws),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_px,
         CAST(sum((base + r + c) % 8) AS BIGINT) AS sum_idx
  FROM px GROUP BY doc_id)
SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
       a.n_px,
       CAST(16 * a.sum_idx + 5 * a.n_px AS BIGINT) AS sum_c0,
       CAST(16 * a.sum_idx + 37 * a.n_px AS BIGINT) AS sum_c1,
       CAST(16 * a.sum_idx + 69 * a.n_px AS BIGINT) AS sum_c2
FROM d JOIN agg a ON a.doc_id = d.doc_id
"""

QUERIES_TAIL["gif_decode_stats"] = gif_decode_stats
ORACLES_TAIL["gif_decode_stats"] = _GIF_STATS_SQL


# -- D27: RAG chunking (overlapping token windows) ------------------------------

_CHUNK_W = 64   # tokens per chunk
_CHUNK_S = 48   # stride (W - S = 16-token overlap)


def chunked_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RAG chunking: split each document into
    overlapping token windows (64-token chunks, 48-token stride — the
    overlap keeps answers that straddle a boundary retrievable), one
    output row per chunk with its position and content hash. Pure
    array expressions: split → filter empties → sequence of starts →
    explode → slice → concat_ws → md5; no UDF, whole-stage codegen,
    and the shuffle-free shape means 100 TB chunks at scan speed.
    The md5 stands in for the chunk text in the registered output so
    result rows stay narrow; a real pipeline would keep the text and
    feed the embedder."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_select(docs).orderBy("doc_id", "chunk_idx")


def chunk_select(docs: DataFrame) -> DataFrame:
    """The chunking transform itself — STATELESS expressions shared by
    the batch query and its streaming twin (chunk-on-ingest needs no
    state, watermark, or aggregation: one document row in, its chunk
    rows out).

    The start sequence stops at n_tok - (W - S) - 1 (ADVICE r8): a
    start beyond that produces a chunk whose tokens are all inside the
    previous chunk (its window end ≤ the previous window's end) — a
    strict suffix-subset that only inflates retriever duplicates."""
    toks = F.filter(F.split(F.col("text"), r"\s+"),
                    lambda x: x != F.lit(""))
    d = docs.select("doc_id", toks.alias("toks"),
                    F.size(toks).alias("n_tok"))
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_tok") - (_CHUNK_W - _CHUNK_S) - 1, F.lit(0)),
        F.lit(_CHUNK_S))
    chunk = F.slice("toks", F.col("start") + 1, _CHUNK_W)
    return (d.filter(F.col("n_tok") > 0)
            .select("doc_id", "toks", F.explode(starts).alias("start"))
            .select("doc_id",
                    (F.col("start") / _CHUNK_S).cast("int")
                    .alias("chunk_idx"),
                    F.col("start").cast("int").alias("start_tok"),
                    F.size(chunk).cast("int").alias("chunk_tokens"),
                    F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5")))


_CHUNKS_SQL = rf"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
sized AS (SELECT doc_id, toks, len(toks) AS n_tok FROM d
          WHERE len(toks) > 0),
starts AS (
  SELECT doc_id, toks, n_tok,
         unnest(generate_series(
             0, greatest(n_tok - {_CHUNK_W - _CHUNK_S} - 1, 0),
             {_CHUNK_S})) AS start
  FROM sized)
SELECT doc_id,
       CAST(start // {_CHUNK_S} AS INT) AS chunk_idx,
       CAST(start AS INT) AS start_tok,
       CAST(len(list_slice(toks, start + 1,
                           least(start + {_CHUNK_W}, n_tok))) AS INT)
         AS chunk_tokens,
       md5(array_to_string(
           list_slice(toks, start + 1,
                      least(start + {_CHUNK_W}, n_tok)), ' '))
         AS chunk_md5
FROM starts
ORDER BY doc_id, chunk_idx
"""

QUERIES_TAIL["chunked_documents"] = chunked_documents
ORACLES_TAIL["chunked_documents"] = _CHUNKS_SQL


# -- D6g: PNG decode — DEFLATE + scanline filters (late round 9) ---------------

def png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode of the SECOND compressed format: plant one
    8-bit truecolor PNG per document (stdlib-zlib DEFLATE; row filters
    cycle None/Sub/Up/Average/Paeth so every defilter path runs), ship
    the bytes through Arrow, parse them back (chunk walk, CRC32
    verification, inflate, per-row defiltering) and emit exact
    per-channel pixel sums. The oracle regenerates the planted lattice
    val=(base+3r+5c+11k) in closed form — a single wrong Paeth
    tie-break or filter byte corrupts the rest of the row, so the hash
    pins the whole filter/DEFLATE round-trip. Same partition-parallel
    two-stage mapInPandas shape as gif_decode_stats."""
    from threat_detection_nosql_spark.operators.multimodal import (
        png_decode_stats as stats, synth_png_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_png_media(docs))


_PNG_STATS_SQL = """
WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 6 AS h, doc_id % 16 AS base
  FROM documents),
rws AS (
  SELECT doc_id, w, base, unnest(generate_series(0, h - 1)) AS r
  FROM d),
px AS (
  SELECT doc_id, base, r, unnest(generate_series(0, w - 1)) AS c
  FROM rws),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_px,
         CAST(sum(base + 3 * r + 5 * c) AS BIGINT) AS s0
  FROM px GROUP BY doc_id)
SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
       a.n_px,
       a.s0 AS sum_c0,
       CAST(a.s0 + 11 * a.n_px AS BIGINT) AS sum_c1,
       CAST(a.s0 + 22 * a.n_px AS BIGINT) AS sum_c2
FROM d JOIN agg a ON a.doc_id = d.doc_id
"""

QUERIES_TAIL["png_decode_stats"] = png_decode_stats
ORACLES_TAIL["png_decode_stats"] = _PNG_STATS_SQL


# -- D6h: JPEG decode — huffman entropy coding + IDCT (round 11) ---------------

def jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end decode of the THIRD compressed format, baseline
    sequential JPEG (ITU T.81, from-scratch — r10 verdict ask #5):
    plant one grayscale JPEG per document from a deterministic
    quantized-coefficient lattice (DC + two ACs per 8x8 block), ship
    the entropy-coded bytes through Arrow, parse them back (marker
    walk, generic DHT canonical-code build, huffman decode with 0xFF00
    unstuffing, DC prediction, dequant, sparse zigzag-ordered
    basis-sum IDCT, floor(x+0.5), clip) and emit the exact luma sum.
    The oracle regenerates the lattice and replays the IDCT arithmetic
    with the decoder's OWN basis doubles as literals — identical
    operands in identical order, so the hash has no float tolerance;
    one bad huffman bit shifts every later code and the sums
    collapse."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_decode_stats as stats, synth_jpeg_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_media(docs))


def _jpeg_stats_sql() -> str:
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_basis)
    b0 = jpeg_basis(0, 0)[0][0]           # constant over the block
    c1 = [jpeg_basis(0, 1)[0][x] for x in range(8)]   # varies along x
    c3 = [jpeg_basis(2, 0)[y][0] for y in range(8)]   # varies along y
    # every float literal is ::DOUBLE — DuckDB parses bare decimal
    # literals as DECIMAL and decimal arithmetic diverges from the
    # decoder's IEEE doubles at round boundaries (found by the color
    # twin: 128.0 + -8.500000000000002 is exactly 119.5 in binary64
    # but not in DECIMAL(18,17))
    case1 = ("CASE x "
             + " ".join(f"WHEN {x} THEN {c1[x]!r}::DOUBLE"
                        for x in range(8))
             + " END")
    case3 = ("CASE y "
             + " ".join(f"WHEN {y} THEN {c3[y]!r}::DOUBLE"
                        for y in range(8))
             + " END")
    return f"""
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS wb FROM documents),
blk AS (SELECT doc_id, wb, unnest(generate_series(0, 1)) AS br FROM d),
blk2 AS (SELECT doc_id, wb, br,
                unnest(generate_series(0, wb - 1)) AS bc FROM blk),
py AS (SELECT doc_id, wb, br, bc,
              unnest(generate_series(0, 7)) AS y FROM blk2),
px AS (SELECT doc_id, wb, br, bc, y,
              unnest(generate_series(0, 7)) AS x FROM py),
val AS (SELECT doc_id, wb,
  CAST(floor(128.0::DOUBLE
    + ((doc_id + 3 * br + 5 * bc) % 21 - 10) * 16 * {b0!r}::DOUBLE
    + ((doc_id + br + 2 * bc) % 7 - 3) * 11 * ({case1})
    + ((doc_id + 2 * br + bc) % 5 - 2) * 14 * ({case3})
    + 0.5::DOUBLE) AS BIGINT) AS v
  FROM px)
SELECT doc_id, CAST(wb * 8 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(count(*) AS INT) AS n_px, CAST(sum(v) AS BIGINT) AS sum_y
FROM val GROUP BY doc_id, wb
"""


QUERIES_TAIL["jpeg_decode_stats"] = jpeg_decode_stats
ORACLES_TAIL["jpeg_decode_stats"] = _jpeg_stats_sql()


def jpeg_restart_decode_stats(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """jpeg_decode_stats over a corpus encoded WITH DRI/RSTn restart
    intervals (1-4 MCUs, varying per doc — every-block restarts,
    uneven tails, modulo-8 RST wraparound; the T.81 F.2.2.4 structure
    real camera JPEGs carry, r11 verdict ask #4). Restart markers
    change the entropy-coded byte stream but not the decoded pixels,
    so the oracle is the SAME planted-lattice replay as
    jpeg_decode_stats — the hash pins restart handling because a
    missed DC-predictor reset or bit misalignment corrupts every
    post-RST block sum."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_decode_stats as stats, synth_jpeg_restart_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_restart_media(docs))


QUERIES_TAIL["jpeg_restart_decode_stats"] = jpeg_restart_decode_stats
ORACLES_TAIL["jpeg_restart_decode_stats"] = _jpeg_stats_sql()


def avi_mjpeg_decode_stats(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """VIDEO end to end — the last decode_media raise closed (r11
    verdict ask #8): plant one MJPEG AVI per document (2-5 baseline
    JPEG frames in a spec-conformant RIFF container — avih, vids/MJPG
    strh/strf, 00dc movi chunks, idx1), ship the container bytes
    through Arrow, walk the RIFF structure back (word-aligned chunks,
    handler verification), decode every frame with the from-scratch
    baseline JPEG decoder, and emit the frame count + exact luma sum
    across all frames. The oracle replays each frame's planted
    lattice (coefficients phase-shifted per frame by 977·(f+1)) with
    the decoder's own basis doubles as literals — one wrong chunk
    boundary or huffman bit collapses the total."""
    from threat_detection_nosql_spark.operators.multimodal import (
        avi_mjpeg_decode_stats as stats, synth_avi_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_avi_media(docs))


def _avi_stats_sql() -> str:
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_basis)
    b0 = jpeg_basis(0, 0)[0][0]
    c1 = [jpeg_basis(0, 1)[0][x] for x in range(8)]
    c3 = [jpeg_basis(2, 0)[y][0] for y in range(8)]
    case1 = ("CASE x "
             + " ".join(f"WHEN {x} THEN {c1[x]!r}::DOUBLE"
                        for x in range(8))
             + " END")
    case3 = ("CASE y "
             + " ".join(f"WHEN {y} THEN {c3[y]!r}::DOUBLE"
                        for y in range(8))
             + " END")
    return f"""
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS wb,
                  2 + doc_id % 4 AS nf FROM documents),
fr AS (SELECT doc_id, wb, nf,
              unnest(generate_series(0, nf - 1)) AS f FROM d),
s AS (SELECT doc_id, wb, nf, doc_id + 977 * (f + 1) AS sd FROM fr),
blk AS (SELECT doc_id, wb, nf, sd,
               unnest(generate_series(0, 1)) AS br FROM s),
blk2 AS (SELECT doc_id, wb, nf, sd, br,
                unnest(generate_series(0, wb - 1)) AS bc FROM blk),
py AS (SELECT doc_id, wb, nf, sd, br, bc,
              unnest(generate_series(0, 7)) AS y FROM blk2),
px AS (SELECT doc_id, wb, nf, sd, br, bc, y,
              unnest(generate_series(0, 7)) AS x FROM py),
val AS (SELECT doc_id, wb, nf,
  CAST(floor(128.0::DOUBLE
    + ((sd + 3 * br + 5 * bc) % 21 - 10) * 16 * {b0!r}::DOUBLE
    + ((sd + br + 2 * bc) % 7 - 3) * 11 * ({case1})
    + ((sd + 2 * br + bc) % 5 - 2) * 14 * ({case3})
    + 0.5::DOUBLE) AS BIGINT) AS v
  FROM px)
SELECT doc_id, CAST(nf AS INT) AS n_frames,
       CAST(wb * 8 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(sum(v) AS BIGINT) AS sum_y
FROM val GROUP BY doc_id, wb, nf
"""


QUERIES_TAIL["avi_mjpeg_decode_stats"] = avi_mjpeg_decode_stats
ORACLES_TAIL["avi_mjpeg_decode_stats"] = _avi_stats_sql()


def jpeg_progressive_decode_stats(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG end to end — closes the last stated
    JPEG gap (r11 verdict "what's missing" #1): plant the gray
    lattice with a full progressive scan script (DC first at Al=1 +
    DC refinement; two spectral AC bands, each first + refinement
    with EOB-run accumulation and woven correction bits — T.81
    Annex G), decode ALL scans (successive-approximation coefficient
    reassembly), IDCT once per block in the baseline decoder's exact
    float order, and emit the exact luma sum. Progressive is a
    lossless reorganization of coefficient transmission, so the
    oracle is the SAME planted-lattice replay as jpeg_decode_stats —
    a single mis-sequenced refinement bit or broken EOB run collapses
    the sums. Parity also proven against the baseline decoder over
    360 randomized coefficient/band/Al configurations in
    tests/test_jpeg.py."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_progressive_decode_stats as stats,
        synth_jpeg_progressive_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_progressive_media(docs))


QUERIES_TAIL["jpeg_progressive_decode_stats"] = \
    jpeg_progressive_decode_stats
ORACLES_TAIL["jpeg_progressive_decode_stats"] = _jpeg_stats_sql()


def tiff_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF end to end — the scanned-document format (TIFF 6.0,
    public spec): plant one gray 8-bit strip-organized TIFF per
    document with compression (PackBits RLE vs none), byte order
    (II vs MM) and rows-per-strip all varying per doc, walk the IFD
    back (inline vs offset tag values, both endians), decompress
    every strip and emit the exact pixel sum. The planted lattice
    has genuine run-length structure (runs of 4 along x broken by a
    mod-3 literal ripple) so PackBits repeat AND literal paths carry
    real data; the oracle replays the lattice in closed form — one
    wrong strip boundary or run count shifts every later byte."""
    from threat_detection_nosql_spark.operators.multimodal import (
        synth_tiff_media, tiff_decode_stats as stats)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_tiff_media(docs))


_TIFF_STATS_SQL = """
WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 6 AS h,
                  doc_id % 151 AS base FROM documents),
rws AS (SELECT doc_id, w, base,
               unnest(generate_series(0, h - 1)) AS r FROM d),
px AS (SELECT doc_id, w, base, r,
              unnest(generate_series(0, w - 1)) AS c FROM rws)
SELECT doc_id, CAST(w AS INT) AS width, CAST(6 AS INT) AS height,
       CAST(count(*) AS INT) AS n_px,
       CAST(sum((base + 3 * r + 5 * (c // 4) + (7 * r + c) % 3)
                % 251) AS BIGINT) AS sum_y
FROM px GROUP BY doc_id, w
"""

QUERIES_TAIL["tiff_decode_stats"] = tiff_decode_stats
ORACLES_TAIL["tiff_decode_stats"] = _TIFF_STATS_SQL




# -- D28: exact substring-level dedup (repeated-span extraction) ---------------
# The training-data op MinHash can't do: document-LEVEL near-dup
# screens keep a doc that embeds a long verbatim quote of another —
# substring dedup finds the duplicated REGION itself (the "exact
# substring deduplication" of Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — public paper; their
# suffix-array build is single-node, this is the distributed k-gram
# re-expression of the same semantics).

_SPAN_K = 8  # tokens per gram; duplicated regions are >= K tokens


def repeated_substring_spans(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Contiguous duplicated-token regions across the corpus: every
    maximal token span covered by ``_SPAN_K``-grams that occur >= 2
    times corpus-wide (within OR across documents). Emits (doc_id,
    span_start, span_end, n_tokens, n_dup_grams) per region — the
    strip-list a substring-dedup pass consumes.

    Plan shape (100-TB story): positional gram projection is
    map-side (zip_with over shifted slices + posexplode, no shuffle);
    duplicate grams come from ONE hash groupBy on md5(gram) — 16-byte
    keys instead of ~50-byte strings through the exchange, and the
    >= 2 filter runs after map-side partial counts; hit positions
    shuffle-join back on the same md5 key; island merging is a window
    PARTITIONED by doc_id (per-doc slices, never a global sort).
    Gap rule: grams at positions p, q (p < q) merge into one region
    iff q <= p + K — their covered ranges [p, p+K-1], [q, q+K-1]
    overlap or touch, so each region is a contiguous duplicated run.

    Exactness: tokenization = split on a single space (the
    template_prefix_dups convention, identical in DuckDB); md5 is
    byte-identical in both engines; all counts/positions integers."""
    from pyspark.sql.window import Window

    from threat_detection_nosql_spark.sources.readers import spread
    # round 12: the gram build is interpreted zip_with HOFs over every
    # token — spread the single-split docs scan across cores (guide
    # §2), and pin the positional-gram frame, which BOTH the
    # duplicate-gram count and the hit join consume (unpinned, the
    # whole gram build ran twice — guide §2.4)
    docs = spread(load_table(spark, sf_dir, "documents"))
    w = F.split(F.col("text"), " ")
    n_g = F.greatest(F.size(w) - _SPAN_K + 1, F.lit(0))
    grams = F.slice(w, 1, n_g)
    for j in range(1, _SPAN_K):
        grams = F.zip_with(grams, F.slice(w, j + 1, n_g),
                           lambda a, b: F.concat_ws(" ", a, b))
    pos_grams = (docs.filter(F.size(w) >= _SPAN_K)
                 .select("doc_id", F.posexplode(grams)
                         .alias("pos", "gram"))
                 .select("doc_id", "pos", F.md5("gram").alias("gh"))
                 .localCheckpoint(eager=False))
    dup = (pos_grams.groupBy("gh")
           .agg(F.count("*").alias("n_occ"))
           .filter(F.col("n_occ") >= 2))
    hits = pos_grams.join(dup, "gh").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    isl = (hits
           .withColumn("brk", F.when(
               F.col("pos") > F.coalesce(
                   F.lag("pos").over(wd), F.lit(-10 ** 9)) + _SPAN_K,
               1).otherwise(0))
           .withColumn("isl", F.sum("brk").over(
               wd.rowsBetween(Window.unboundedPreceding, 0))))
    return (isl.groupBy("doc_id", "isl")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + _SPAN_K - 1).alias("span_end"),
                 F.count("*").cast("long").alias("n_dup_grams"))
            .select("doc_id", "span_start", "span_end",
                    (F.col("span_end") - F.col("span_start") + 1)
                    .cast("long").alias("n_tokens"), "n_dup_grams")
            .orderBy("doc_id", "span_start"))


_SPAN_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(w[i:i + {_SPAN_K - 1}], ' ')) AS gh
      FROM t, LATERAL (SELECT unnest(range(1, len(w) - {_SPAN_K - 2}))
                       AS i) ix
      WHERE len(w) >= {_SPAN_K}),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
h AS (SELECT doc_id, pos FROM g JOIN dup USING (gh)),
isl AS (SELECT doc_id, pos,
               CASE WHEN pos > coalesce(lag(pos) OVER (
                      PARTITION BY doc_id ORDER BY pos), -1000000000)
                      + {_SPAN_K}
                    THEN 1 ELSE 0 END AS brk
        FROM h),
c AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS isl
      FROM isl)
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {_SPAN_K - 1} AS INT) AS span_end,
       CAST(max(pos) + {_SPAN_K - 1} - min(pos) + 1 AS BIGINT)
         AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_dup_grams
FROM c GROUP BY doc_id, isl
ORDER BY doc_id, span_start
"""

QUERIES_TAIL["repeated_substring_spans"] = repeated_substring_spans
ORACLES_TAIL["repeated_substring_spans"] = _SPAN_SQL




# -- D6i: color JPEG decode — interleaved MCUs + YCbCr (round 11) --------------

def jpeg_color_decode_stats(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """4:4:4 COLOR baseline JPEG end to end: plant one 3-component
    YCbCr JPEG per document (per-component coefficient lattices, Y on
    the Annex-K luminance quant table, chroma on the chrominance
    table, separate huffman table pairs), decode the interleaved MCU
    scan (per-component DC predictors), convert integer YCbCr planes
    to RGB with the JFIF constants, and emit exact per-channel sums.
    The oracle replays components AND color conversion with the
    decoder's own basis/JFIF doubles as literals — identical operands
    in identical order, zero float tolerance."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_color_decode_stats as stats, synth_jpeg_color_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_color_media(docs))


def _jpeg_color_stats_sql() -> str:
    from threat_detection_nosql_spark.operators.multimodal import (
        JPEG_CB_B, JPEG_CB_G, JPEG_CR_G, JPEG_CR_R, jpeg_basis)
    b0 = jpeg_basis(0, 0)[0][0]
    c1 = [jpeg_basis(0, 1)[0][x] for x in range(8)]
    c3 = [jpeg_basis(2, 0)[y][0] for y in range(8)]
    case1 = ("CASE x "
             + " ".join(f"WHEN {x} THEN {c1[x]!r}::DOUBLE"
                        for x in range(8))
             + " END")
    case3 = ("CASE y "
             + " ".join(f"WHEN {y} THEN {c3[y]!r}::DOUBLE"
                        for y in range(8))
             + " END")

    def comp(c: int, q0: int, q1: int, q3: int) -> str:
        """Integer sample plane for component c (clip is a no-op by
        lattice construction but kept for decoder fidelity)."""
        return (
            f"greatest(0, least(255, CAST(floor(128.0::DOUBLE"
            f" + ((doc_id + 3 * br + 5 * bc + {7 * c}) % 21 - 10)"
            f" * {q0} * {b0!r}::DOUBLE"
            f" + ((doc_id + br + 2 * bc + {3 * c}) % 7 - 3)"
            f" * {q1} * ({case1})"
            f" + ((doc_id + 2 * br + bc + {5 * c}) % 5 - 2)"
            f" * {q3} * ({case3})"
            f" + 0.5::DOUBLE) AS BIGINT)))")

    return f"""
WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS wb FROM documents),
blk AS (SELECT doc_id, wb, unnest(generate_series(0, 1)) AS br FROM d),
blk2 AS (SELECT doc_id, wb, br,
                unnest(generate_series(0, wb - 1)) AS bc FROM blk),
py AS (SELECT doc_id, wb, br, bc,
              unnest(generate_series(0, 7)) AS y FROM blk2),
px AS (SELECT doc_id, wb, br, bc, y,
              unnest(generate_series(0, 7)) AS x FROM py),
ycc AS (SELECT doc_id, wb,
               {comp(0, 16, 11, 14)} AS yv,
               {comp(1, 17, 18, 24)} AS cbv,
               {comp(2, 17, 18, 24)} AS crv
        FROM px),
rgb AS (SELECT doc_id, wb,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CR_R!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS r,
  greatest(0, least(255, CAST(floor(
    yv - {JPEG_CB_G!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       - {JPEG_CR_G!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS g,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CB_B!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS b
  FROM ycc)
SELECT doc_id, CAST(wb * 8 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(count(*) AS INT) AS n_px,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM rgb GROUP BY doc_id, wb
"""


QUERIES_TAIL["jpeg_color_decode_stats"] = jpeg_color_decode_stats
ORACLES_TAIL["jpeg_color_decode_stats"] = _jpeg_color_stats_sql()


# -- D6j: 4:2:0 JPEG decode — chroma subsampling (round 11) --------------------

def jpeg420_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subsampled color JPEG end to end — the sampling real photos
    use: plant one 4:2:0 YCbCr JPEG per document (each MCU carries
    FOUR Y blocks + one Cb + one Cr; per-component block grids),
    decode the interleaved scan, replicate chroma 2x (nearest
    neighbor: sample = pixel//2 — the deterministic rule the oracle
    replays; JFIF's centered filter is a documented deviation),
    convert to RGB, emit exact per-channel sums. One wrong block in
    the 6-block MCU walk or a swapped predictor shifts every later
    huffman code — the hash pins the interleave order itself."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_color_decode_stats as stats, synth_jpeg_420_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_420_media(docs))


def _jpeg420_stats_sql() -> str:
    from threat_detection_nosql_spark.operators.multimodal import (
        JPEG_CB_B, JPEG_CB_G, JPEG_CR_G, JPEG_CR_R, jpeg_basis)
    b0 = jpeg_basis(0, 0)[0][0]
    c1 = [jpeg_basis(0, 1)[0][x] for x in range(8)]
    c3 = [jpeg_basis(2, 0)[y][0] for y in range(8)]

    def case(var: str, vals: list[float]) -> str:
        return ("CASE " + var + " "
                + " ".join(f"WHEN {i} THEN {vals[i]!r}::DOUBLE"
                           for i in range(8))
                + " END")

    def comp(c: int, q0: int, q1: int, q3: int,
             br: str, bc: str, iy: str, ix: str) -> str:
        """Component sample at its own plane coordinates — br/bc/iy/ix
        are SQL expressions for block row/col and in-block offsets."""
        return (
            f"greatest(0, least(255, CAST(floor(128.0::DOUBLE"
            f" + ((doc_id + 3 * ({br}) + 5 * ({bc}) + {7 * c}) % 21"
            f" - 10) * {q0} * {b0!r}::DOUBLE"
            f" + ((doc_id + ({br}) + 2 * ({bc}) + {3 * c}) % 7 - 3)"
            f" * {q1} * ({case(ix, c1)})"
            f" + ((doc_id + 2 * ({br}) + ({bc}) + {5 * c}) % 5 - 2)"
            f" * {q3} * ({case(iy, c3)})"
            f" + 0.5::DOUBLE) AS BIGINT)))")

    yv = comp(0, 16, 11, 14, "y // 8", "x // 8", "y % 8", "x % 8")
    cbv = comp(1, 17, 18, 24, "(y // 2) // 8", "(x // 2) // 8",
               "(y // 2) % 8", "(x // 2) % 8")
    crv = comp(2, 17, 18, 24, "(y // 2) // 8", "(x // 2) // 8",
               "(y // 2) % 8", "(x // 2) % 8")
    return f"""
WITH d AS (SELECT doc_id, 16 * (1 + doc_id % 2) AS w FROM documents),
py AS (SELECT doc_id, w, unnest(generate_series(0, 15)) AS y FROM d),
px AS (SELECT doc_id, w, y, unnest(generate_series(0, w - 1)) AS x
       FROM py),
ycc AS (SELECT doc_id, w, {yv} AS yv, {cbv} AS cbv, {crv} AS crv
        FROM px),
rgb AS (SELECT doc_id, w,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CR_R!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS r,
  greatest(0, least(255, CAST(floor(
    yv - {JPEG_CB_G!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       - {JPEG_CR_G!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS g,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CB_B!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS b
  FROM ycc)
SELECT doc_id, CAST(w AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(count(*) AS INT) AS n_px,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM rgb GROUP BY doc_id, w
"""


QUERIES_TAIL["jpeg420_decode_stats"] = jpeg420_decode_stats
ORACLES_TAIL["jpeg420_decode_stats"] = _jpeg420_stats_sql()


# -- D6k: sampled-lattice decode digests (round 12) ----------------------------
# The full-lattice color/420 oracles replay EVERY pixel — ~192M rows
# at the 100x soak, impractical single-box (their 100x records were
# execution+rowcount only; r11 verdict ask #2). These digest twins
# decode the SAME blobs completely on the Spark side but emit sums
# over only the md5-selected ~1/97 raster positions, and the oracle
# enumerates ONLY those positions via a stepped range — hash parity
# at 100x for ~1/97 the oracle cost.

def jpeg_color_sampled_digest(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Position-sampled digest of the 4:4:4 color decode: full
    interleaved-MCU decode per blob, channel sums over raster
    positions p % 97 == r, r = int(md5(str(doc_id))[:6], 16) % 97.
    97 is prime and coprime to the 8-pixel block period so sampled
    positions sweep every in-block phase; one bad huffman bit still
    shifts every later code, so the sampled sums collapse the same
    way the full sums do."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_sampled_digest, synth_jpeg_color_media)
    docs = load_table(spark, sf_dir, "documents")
    return jpeg_sampled_digest(synth_jpeg_color_media(docs))


def jpeg420_sampled_digest(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Position-sampled digest of the 4:2:0 subsampled decode — same
    md5-position rule as jpeg_color_sampled_digest over the 4:2:0
    corpus (chroma replication verified at the sampled positions)."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_sampled_digest, synth_jpeg_420_media)
    docs = load_table(spark, sf_dir, "documents")
    return jpeg_sampled_digest(synth_jpeg_420_media(docs))


def _jpeg_sampled_sql(is420: bool) -> str:
    """Sampled-position replay: identical per-pixel arithmetic to the
    full-lattice oracles, but positions come from a stepped range —
    DuckDB generates ~1/97 of the rows instead of filtering all of
    them."""
    from threat_detection_nosql_spark.operators.multimodal import (
        JPEG_CB_B, JPEG_CB_G, JPEG_CR_G, JPEG_CR_R, jpeg_basis)
    b0 = jpeg_basis(0, 0)[0][0]
    c1 = [jpeg_basis(0, 1)[0][x] for x in range(8)]
    c3 = [jpeg_basis(2, 0)[y][0] for y in range(8)]

    def case(var: str, vals: list[float]) -> str:
        return ("CASE " + var + " "
                + " ".join(f"WHEN {i} THEN {vals[i]!r}::DOUBLE"
                           for i in range(8))
                + " END")

    def comp(c: int, q0: int, q1: int, q3: int,
             br: str, bc: str, iy: str, ix: str) -> str:
        return (
            f"greatest(0, least(255, CAST(floor(128.0::DOUBLE"
            f" + ((doc_id + 3 * ({br}) + 5 * ({bc}) + {7 * c}) % 21"
            f" - 10) * {q0} * {b0!r}::DOUBLE"
            f" + ((doc_id + ({br}) + 2 * ({bc}) + {3 * c}) % 7 - 3)"
            f" * {q1} * ({case(ix, c1)})"
            f" + ((doc_id + 2 * ({br}) + ({bc}) + {5 * c}) % 5 - 2)"
            f" * {q3} * ({case(iy, c3)})"
            f" + 0.5::DOUBLE) AS BIGINT)))")

    if is420:
        width = "16 * (1 + doc_id % 2)"
        cy, cx = "(y // 2)", "(x // 2)"
    else:
        width = "8 * (2 + doc_id % 3)"
        cy, cx = "y", "x"
    yv = comp(0, 16, 11, 14, "y // 8", "x // 8", "y % 8", "x % 8")
    cbv = comp(1, 17, 18, 24, f"{cy} // 8", f"{cx} // 8",
               f"{cy} % 8", f"{cx} % 8")
    crv = comp(2, 17, 18, 24, f"{cy} // 8", f"{cx} // 8",
               f"{cy} % 8", f"{cx} % 8")
    return f"""
WITH d AS (SELECT doc_id, {width} AS w,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                       1, 6)) AS INT) % 97 AS r
           FROM documents),
pos AS (SELECT doc_id, w, unnest(range(r, 16 * w, 97)) AS p FROM d),
xy AS (SELECT doc_id, w, p // w AS y, p % w AS x FROM pos),
ycc AS (SELECT doc_id, w, {yv} AS yv, {cbv} AS cbv, {crv} AS crv
        FROM xy),
rgb AS (SELECT doc_id, w,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CR_R!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS r,
  greatest(0, least(255, CAST(floor(
    yv - {JPEG_CB_G!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       - {JPEG_CR_G!r}::DOUBLE * (crv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS g,
  greatest(0, least(255, CAST(floor(
    yv + {JPEG_CB_B!r}::DOUBLE * (cbv - 128.0::DOUBLE)
       + 0.5::DOUBLE) AS BIGINT))) AS b
  FROM ycc)
SELECT doc_id, CAST(w AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(count(*) AS INT) AS n_sampled,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM rgb GROUP BY doc_id, w
"""


QUERIES_TAIL["jpeg_color_sampled_digest"] = jpeg_color_sampled_digest
ORACLES_TAIL["jpeg_color_sampled_digest"] = _jpeg_sampled_sql(False)
QUERIES_TAIL["jpeg420_sampled_digest"] = jpeg420_sampled_digest
ORACLES_TAIL["jpeg420_sampled_digest"] = _jpeg_sampled_sql(True)


def jpeg_progressive_color_decode_stats(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """Progressive COLOR (4:4:4): one INTERLEAVED DC first scan
    (per-component predictors over MCU order — T.81 allows
    interleave only for DC in progressive) + interleaved DC
    refinements, then per-component spectral-band AC first/refine
    scans. Same planted lattice and oracle as the baseline color
    query; parity against the baseline decoder also proven over 180
    randomized sampling/Al configurations in tests."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_progressive_color_stats as stats,
        synth_jpeg_progressive_color_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_progressive_color_media(docs))


def jpeg_progressive_420_decode_stats(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Progressive 4:2:0: the interleaved DC scans walk the
    6-blocks-per-MCU subsampled structure while AC scans cover each
    component's own block grid — the combination real progressive
    photos use. Oracle shared with the baseline 4:2:0 query."""
    from threat_detection_nosql_spark.operators.multimodal import (
        jpeg_progressive_color_stats as stats,
        synth_jpeg_progressive_color_media)
    docs = load_table(spark, sf_dir, "documents")
    return stats(synth_jpeg_progressive_color_media(
        docs, subsampled=True))


QUERIES_TAIL["jpeg_progressive_color_decode_stats"] = \
    jpeg_progressive_color_decode_stats
ORACLES_TAIL["jpeg_progressive_color_decode_stats"] = \
    _jpeg_color_stats_sql()
QUERIES_TAIL["jpeg_progressive_420_decode_stats"] = \
    jpeg_progressive_420_decode_stats
ORACLES_TAIL["jpeg_progressive_420_decode_stats"] = _jpeg420_stats_sql()
