"""Training-data-pipeline queries + DuckDB oracles (documents/embeddings).

Spark side runs textops.py (pure Catalyst); SQL side re-derives the
same answer with the identical deterministic primitives:
  h(s)  = ('0x' || substr(md5(s),1,15))::BIGINT        (= Spark conv)
  tok(t)= regexp_split_to_array(trim(t), '\\s+')        (= Spark split)
  r6(x) = floor(x*1e6 + 0.5)/1e6                        (= textops.r6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import textops as T


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- queries

def q_dedup_exact(spark, sf_dir):
    return T.exact_dedup(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    return T.token_stats(_docs(spark, sf_dir))


def q_quality_scores(spark, sf_dir):
    return T.quality_scores(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return T.lang_id(_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return T.fingerprints(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    return T.simhash_table(_docs(spark, sf_dir))


def q_minhash_lsh_pairs(spark, sf_dir):
    return T.minhash_lsh_pairs(_docs(spark, sf_dir))


def q_ngram_jaccard_pairs(spark, sf_dir):
    return T.ngram_jaccard_pairs(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark, sf_dir):
    return T.cosine_topk(_emb(spark, sf_dir))


def q_ann_lsh_topk(spark, sf_dir):
    return T.ann_lsh_topk(_emb(spark, sf_dir))


def q_embedding_neardup(spark, sf_dir):
    return T.embedding_neardup_pairs(_emb(spark, sf_dir))


def q_ann_ivf_topk(spark, sf_dir):
    return T.ann_ivf_topk(_emb(spark, sf_dir))


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "quality_scores": q_quality_scores,
    "lang_id": q_lang_id,
    "fingerprints": q_fingerprints,
    "simhash": q_simhash,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_neardup": q_embedding_neardup,
}


# ------------------------------------------------------------- oracle SQL

_TOK_CTE = """
WITH d AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS tok
  FROM documents
)
"""

_SHINGLE_CTE = _TOK_CTE + """
, sh AS (
  SELECT doc_id, text,
    list_distinct(CASE WHEN len(tok) >= 3
      THEN list_transform(range(1, CAST(len(tok) AS INT) - 1),
                          i -> tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2])
      ELSE [text] END) AS shingles
  FROM d
)
"""


def _sql_hash(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def _sql_r6(expr: str) -> str:
    return f"floor(({expr}) * 1000000.0 + 0.5) / 1000000.0"


def _sql_sum_list(expr: str) -> str:
    """Sequential left-fold sum of a DOUBLE list (matches F.aggregate)."""
    return f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {expr}), (x, y) -> x + y)"


def _sql_dot(a: str, b: str) -> str:
    return _sql_sum_list(
        f"list_transform(range(1, CAST(len({a}) AS INT) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))")


def _sql_cosine(a: str, b: str) -> str:
    return (f"({_sql_dot(a, b)}) / "
            f"(sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))")


def _minhash_sig_sql() -> str:
    terms = []
    for a, b in T.minhash_coeffs():
        terms.append(
            f"list_min(list_transform(hashes, h -> ({a} * (h % {T.MINHASH_P}) + {b}) % {T.MINHASH_P}))")
    return "[" + ", ".join(terms) + "]"


def _simhash_sql() -> str:
    terms = []
    for b in range(T.SIMHASH_BITS):
        bit_sum = ("list_reduce(list_prepend(CAST(0 AS BIGINT), "
                   f"list_transform(hashes, h -> ((h >> {b}) & 1) * 2 - 1)), (x, y) -> x + y)")
        terms.append(f"(CASE WHEN {bit_sum} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)")
    return " + ".join(terms)


def _stop_filter(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in T.STOPWORDS[lang])
    return f"CAST(len(list_filter(tok, t -> t IN ({words}))) AS INT)"


def _bucket_sql(emb: str) -> str:
    parts = []
    for p, w in enumerate(T.hyperplanes()):
        warr = "[" + ", ".join(str(v) for v in w) + "]"
        dot = _sql_sum_list(
            f"list_transform(range(1, CAST(len({emb}) AS INT) + 1), "
            f"i -> CAST({emb}[i] AS DOUBLE) * CAST(({warr})[i] AS DOUBLE))")
        parts.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(parts)


_JAC = _sql_r6(
    "CAST(len(list_filter(a.shingles, x -> list_contains(b.shingles, x))) AS DOUBLE) / "
    "CAST(len(a.shingles) + len(b.shingles) "
    "- len(list_filter(a.shingles, x -> list_contains(b.shingles, x))) AS DOUBLE)")


ORACLES = {
    "dedup_exact": """
SELECT sha256(text) AS text_sha, min(doc_id) AS rep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1
""",
    "token_stats": _TOK_CTE + """
SELECT doc_id,
  CAST(len(tok) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_alnum_runs,
  CAST(length(text) AS INT) AS n_chars
FROM d
""",
    "quality_scores": _TOK_CTE + f"""
SELECT doc_id,
  CAST(len(tok) AS INT) AS n_tokens,
  {_sql_r6("(CAST(length(text) AS DOUBLE) - (CAST(len(tok) AS DOUBLE) - 1)) / CAST(len(tok) AS DOUBLE)")} AS mean_token_len,
  {_sql_r6(_stop_filter('en') + " / CAST(len(tok) AS DOUBLE)")} AS stopword_ratio,
  {_sql_r6("CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE)")} AS unique_ratio,
  {_sql_r6("least(CAST(len(tok) AS DOUBLE) / 100.0, 1.0) * 0.4"
           " + least(" + _stop_filter('en') + " / CAST(len(tok) AS DOUBLE) * 5.0, 1.0) * 0.2"
           " + CAST(len(list_distinct(tok)) AS DOUBLE) / CAST(len(tok) AS DOUBLE) * 0.4")} AS quality
FROM d
""",
    "lang_id": _TOK_CTE + f"""
SELECT doc_id,
  {_stop_filter('en')} AS score_en,
  {_stop_filter('de')} AS score_de,
  {_stop_filter('fr')} AS score_fr,
  CASE WHEN {_stop_filter('fr')} > greatest({_stop_filter('en')}, {_stop_filter('de')}) THEN 'fr'
       WHEN {_stop_filter('de')} > {_stop_filter('en')} THEN 'de'
       ELSE 'en' END AS pred_lang
FROM d
""",
    "fingerprints": _TOK_CTE + f"""
SELECT doc_id,
  list_reduce(list_prepend(CAST(0 AS BIGINT),
    list_transform(tok, t -> {_sql_hash('t')} % {T.FP_MOD})),
    (acc, h) -> (acc * {T.FP_MUL} + h) % {T.FP_MOD}) AS fp
FROM d
""",
    "simhash": _TOK_CTE + f"""
, h AS (
  SELECT doc_id, list_transform(tok, t -> {_sql_hash('t')}) AS hashes FROM d
)
SELECT doc_id, {_simhash_sql()} AS simhash FROM h
""",
    "minhash_lsh_pairs": _SHINGLE_CTE + f"""
, sig AS (
  SELECT doc_id, shingles, {_minhash_sig_sql()} AS sig
  FROM (SELECT doc_id, shingles,
          list_transform(shingles, s -> {_sql_hash('s')}) AS hashes
        FROM sh)
),
bands0 AS (
  SELECT doc_id, shingles, band,
    sig[band*4 + 1]::VARCHAR || '-' || sig[band*4 + 2]::VARCHAR || '-' ||
    sig[band*4 + 3]::VARCHAR || '-' || sig[band*4 + 4]::VARCHAR AS key
  FROM sig, (SELECT unnest(range(4)) AS band)
),
bands AS (
  -- hot-bucket cap (textops.MAX_LSH_BUCKET)
  SELECT * FROM bands0 QUALIFY count(*) OVER (PARTITION BY band, key) <= {T.MAX_LSH_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, {_JAC} AS jac
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jac FROM cand WHERE jac >= 0.2
""",
    "ngram_jaccard_pairs": _SHINGLE_CTE + f"""
, lim AS (SELECT * FROM sh WHERE doc_id < 200)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {_JAC} AS jac
FROM lim a JOIN lim b ON a.doc_id < b.doc_id
WHERE {_JAC} >= 0.02
""",
    "ann_cosine_topk": f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nbr_id, embedding AS c_emb FROM embeddings),
scored AS (
  SELECT q_id, nbr_id, {_sql_cosine('q_emb', 'c_emb')} AS sim
  FROM c, q WHERE q_id <> nbr_id
),
ranked AS (
  SELECT q_id, nbr_id, sim,
    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nbr_id) AS rank
  FROM scored
)
SELECT q_id, nbr_id, {_sql_r6('sim')} AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
    "ann_lsh_topk": f"""
WITH b AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM b WHERE vec_id < 10),
c AS (SELECT vec_id AS nbr_id, embedding AS c_emb, bucket FROM b),
scored AS (
  SELECT q_id, nbr_id, {_sql_cosine('q_emb', 'c_emb')} AS sim
  FROM c JOIN q USING (bucket) WHERE q_id <> nbr_id
),
ranked AS (
  SELECT q_id, nbr_id, sim,
    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nbr_id) AS rank
  FROM scored
)
SELECT q_id, nbr_id, {_sql_r6('sim')} AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
    "ann_ivf_topk": f"""
WITH cents AS (
  SELECT c, list_transform(range(64),
    i -> CAST((((7 + (c*64 + i)*2654435761) % 4294967296) % 2001) - 1000 AS DOUBLE)/1000.0) AS cv
  FROM (SELECT unnest(range({T.IVF_K})) AS c)
),
dist AS (
  SELECT e.vec_id, e.embedding, c.c,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(range(1, 65),
      i -> (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i]))),
      (a, b) -> a + b) AS d
  FROM embeddings e, cents c
),
assigned AS (
  SELECT vec_id, embedding, c AS ivf_list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM dist)
  WHERE rn = 1
),
qprobe AS (
  SELECT vec_id AS q_id, embedding AS q_emb, c AS ivf_list FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
    FROM dist WHERE vec_id < 10)
  WHERE rn <= {T.IVF_NPROBE}
),
scored AS (
  SELECT q.q_id, a.vec_id AS nbr_id, {_sql_cosine('q.q_emb', 'a.embedding')} AS sim
  FROM assigned a JOIN qprobe q USING (ivf_list)
  WHERE q.q_id <> a.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, nbr_id) AS rank
  FROM scored
)
SELECT q_id, nbr_id, {_sql_r6('sim')} AS sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
    "embedding_neardup": f"""
WITH b0 AS (
  SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket FROM embeddings
),
b AS (
  -- hot-bucket cap (textops.MAX_LSH_BUCKET)
  SELECT * FROM b0 QUALIFY count(*) OVER (PARTITION BY bucket) <= {T.MAX_LSH_BUCKET}
),
pairs AS (
  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
    {_sql_r6(_sql_cosine('a.embedding', 'b2.embedding'))} AS sim
  FROM b a JOIN b b2 USING (bucket)
  WHERE a.vec_id < b2.vec_id
)
SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= 0.3
""",
}
