"""Training-data pipeline operators over the documents table.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), text analysis (language-ID, quality scoring, token
counting, fingerprinting) — all pure Catalyst column expressions
(JVM-side, whole-stage codegen; no Python on the hot path), designed
so every derivation is also closed-form SQL for the DuckDB oracle
(queries_text.ORACLES).

Shared deterministic primitives (identical in Spark and DuckDB):
  token hash  h(s)   = bigint of first 15 hex chars of md5(s)   (60 bit)
  tokens(t)          = split(trim(t), '\\s+')
Scale notes per function docstrings; the LSH family is the 100 TB
path (candidate generation by equi-join on band buckets — no O(n²)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- constants

MINHASH_K = 16          # signature length
MINHASH_BANDS = 4       # bands of 4 rows -> candidate pairs
MINHASH_P = 4294967291  # prime < 2^32 keeps a*h below 2^63
SIMHASH_BITS = 60       # 15 hex chars of md5 -> 60-bit token hashes
FP_MOD = 1000000007     # fingerprint rolling-hash modulus
FP_MUL = 131
# LSH hot-bucket cap: a degenerate band key (e.g. a boilerplate shingle
# pattern shared by millions of docs) would make the bucket self-join
# O(bucket^2); buckets past the cap are dropped — their members are
# near-universal patterns, not meaningful near-dup candidates. The same
# QUALIFY appears in the SQL oracles so both engines agree.
MAX_LSH_BUCKET = 1000

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "auf", "mit", "ein"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "dans", "pour", "sur"],
}
LANG_ORDER = ["en", "de", "fr"]  # deterministic tie-break order


def minhash_coeffs(k: int = MINHASH_K):
    """Deterministic (a_j, b_j) for k universal-hash functions.
    a < 2^31 so a*(h mod P) stays inside int64."""
    out = []
    for j in range(k):
        a = (j * 2654435761 + 1) % 2147483647 + 1
        b = (j * 1013904223 + 7) % 2147483647
        out.append((a, b))
    return out


def hyperplanes(n_planes: int = 8, dim: int = 64):
    """Deterministic pseudo-random hyperplane weights in [-1000, 1000]
    for sign-LSH over embeddings (SimHash-for-vectors)."""
    planes = []
    for p in range(n_planes):
        w = [((1 + (p * dim + i) * 2654435761) % 4294967296) % 2001 - 1000
             for i in range(dim)]
        planes.append(w)
    return planes


# ---------------------------------------------------------------- primitives

def r6(x: Column) -> Column:
    """Deterministic 6-dp rounding (floor(x*1e6+0.5)/1e6) — written the
    same way in the SQL oracles so both engines round identically."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


def token_hash(col: Column) -> Column:
    """60-bit deterministic string hash (md5-prefix); identical to
    DuckDB's ('0x'||substr(md5(s),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(tok: Column, text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles; whole text when fewer than n tokens."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(tok, i + j) for j in range(n)]),
    )
    return F.when(F.size(tok) >= n, grams).otherwise(F.array(text_col))


def minhash_signature(shingle_hashes: Column, k: int = MINHASH_K) -> Column:
    """k-wide MinHash signature over a column of shingle-hash arrays.
    Scale path: per-row array math — embarrassingly parallel, no shuffle."""
    sigs = []
    for a, b in minhash_coeffs(k):
        sigs.append(F.array_min(F.transform(
            shingle_hashes, lambda h: (F.lit(a) * (h % F.lit(MINHASH_P)) + F.lit(b)) % F.lit(MINHASH_P))))
    return F.array(*sigs)


def simhash_table_relational(docs: DataFrame) -> DataFrame:
    """60-bit SimHash: bit b set iff sum over tokens of (+1/-1 for bit b
    of h(token)) is positive. Computed relationally — explode tokens,
    hash once, groupBy(doc_id) with 60 conditional sums (partial agg
    map-side; no giant per-row expression trees)."""
    tok_rows = (docs.select("doc_id", tokens(F.col("text")).alias("tok"))
                    .select("doc_id", F.explode("tok").alias("t"))
                    .select("doc_id", token_hash(F.col("t")).alias("h")))
    aggs = [F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s{b}")
            for b in range(SIMHASH_BITS)]
    g = tok_rows.groupBy("doc_id").agg(*aggs)
    acc = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        acc = acc + F.when(F.col(f"s{b}") > 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return g.select("doc_id", acc.alias("simhash"))


def fingerprint(tok: Column) -> Column:
    """Rolling polynomial document fingerprint over token hashes."""
    hashes = F.transform(tok, token_hash)
    return F.aggregate(
        hashes, F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(FP_MUL) + (h % F.lit(FP_MOD))) % F.lit(FP_MOD))


def jaccard(sa: Column, sb: Column) -> Column:
    """Set Jaccard over two shingle arrays (distinct semantics)."""
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.when(union > 0, r6(inter / union)).otherwise(F.lit(0.0))


# ------------------------------------------------------------ dedup family

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash — the 100 TB-safe grouping key is the
    64-hex sha256, not the raw text (tiny shuffle payload)."""
    return (docs
            .groupBy(F.sha2(F.col("text"), 256).alias("text_sha"))
            .agg(F.min("doc_id").alias("rep_doc_id"),
                 F.count(F.lit(1)).alias("n_copies")))


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows, distinct per doc. Staged projections keep
    each Catalyst expression small (the split/shingle tree is built ONCE
    per row, not re-inlined into every downstream reference — inlining
    made codegen quadratic and janino compile times explode)."""
    staged = (docs
              .select("doc_id", tokens(F.col("text")).alias("tok"), "text")
              .select("doc_id", word_shingles(F.col("tok"), F.col("text")).alias("sh")))
    return staged.select("doc_id", F.explode(F.array_distinct("sh")).alias("shingle"))


def shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) distinct shingle-hash rows — the relational currency
    for both signature building and Jaccard refinement."""
    return (shingle_rows(docs)
            .select("doc_id", token_hash(F.col("shingle")).alias("h"))
            .distinct())


def with_minhash(docs: DataFrame, k: int = MINHASH_K,
                 hashes: DataFrame | None = None) -> DataFrame:
    """MinHash signatures computed RELATIONALLY: explode shingles, hash
    each once, groupBy(doc_id) with k min-aggregates. Map-side partial
    aggregation shrinks the shuffle to one row per (mapper, doc) — the
    shape that survives 10^12 docs (vs. per-row array math whose
    expression tree breaks whole-stage codegen). Pass a precomputed
    (doc_id, h) table to share the shingle scan with other consumers."""
    hh = (hashes if hashes is not None else shingle_hashes(docs))         .withColumn("hh", F.col("h") % F.lit(MINHASH_P))
    aggs = [F.min((F.lit(a) * F.col("hh") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{j}")
            for j, (a, b) in enumerate(minhash_coeffs(k))]
    aggs.append(F.count(F.lit(1)).alias("n_sh"))
    g = hh.groupBy("doc_id").agg(*aggs)
    return g.select("doc_id",
                    F.array(*[F.col(f"mh{j}") for j in range(k)]).alias("sig"),
                    "n_sh")


def cap_buckets(band_rows: DataFrame, keys: list,
                max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket`` (hot-bucket guard —
    see MAX_LSH_BUCKET). One extra partial-agg pass over the band rows;
    the count join reuses the band-key partitioning."""
    sizes = band_rows.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bn"))
    return (band_rows.join(sizes.where(F.col("_bn") <= max_bucket), keys)
                     .drop("_bn"))


def minhash_lsh_pairs(docs: DataFrame, k: int = MINHASH_K,
                      bands: int = MINHASH_BANDS,
                      threshold: float = 0.2,
                      max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """Near-duplicate candidate pairs by banded MinHash-LSH, refined by
    exact shingle Jaccard. Candidate generation is an equi-join on
    (band index, band key): at 10^12 docs this shuffles only
    bands×n rows and never goes O(n²); hot buckets are bounded by the
    band-key entropy (and AQE skew-split handles stragglers)."""
    rows = k // bands
    # materialize the two reused intermediates: hh feeds the signature
    # build AND the refine joins; sigs feeds both sides of the band
    # self-join plus the count lookups. Without the checkpoints Catalyst
    # re-executes each subtree per consumer (measured: 26 s of actual
    # work ballooning to 230 s). On a cluster these are the natural
    # Iceberg stage-checkpoint boundaries.
    hh = shingle_hashes(docs).localCheckpoint()
    sigs = with_minhash(docs, k, hashes=hh).localCheckpoint()
    band_rows = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws("-", *[F.element_at("sig", b * rows + r + 1).cast("string")
                                        for r in range(rows)]).alias("key"))
            for b in range(bands)])).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    band_rows = cap_buckets(band_rows, ["band", "key"], max_bucket)
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (a.join(b, ["band", "key"])
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
             .distinct()
             .localCheckpoint())
    # refine RELATIONALLY: intersection sizes via a hash equi-join +
    # groupBy (partial agg), never materializing shingle arrays per
    # pair — carrying collect_set arrays through a wide candidate join
    # was GC-bound (heap grows with parallelism; measured: local[2]
    # beat local[8] before this change)
    inter = (cand
             .join(hh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
             .join(hh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
             .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("n_inter")))
    counts = sigs.select("doc_id", "n_sh")
    pairs = (cand
             .join(counts.select(F.col("doc_id").alias("doc_a"),
                                 F.col("n_sh").alias("n_a")), "doc_a")
             .join(counts.select(F.col("doc_id").alias("doc_b"),
                                 F.col("n_sh").alias("n_b")), "doc_b")
             .join(inter, ["doc_a", "doc_b"], "left")
             .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
             .select("doc_a", "doc_b",
                     r6(F.col("n_inter").cast("double")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")).alias("jac")))
    return pairs.where(F.col("jac") >= threshold)


def ngram_jaccard_pairs(docs: DataFrame, max_doc_id: int = 200,
                        threshold: float = 0.02) -> DataFrame:
    """Exact n-gram Jaccard over a bounded candidate set (brute-force
    verifier — the LSH path above is the scale path)."""
    sh = (shingle_rows(docs.where(F.col("doc_id") < max_doc_id))
          .groupBy("doc_id").agg(F.collect_set("shingle").alias("shingles")))
    a, b = sh.alias("a"), sh.alias("b")
    return (a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
             .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                     jaccard(F.col("a.shingles"), F.col("b.shingles")).alias("jac"))
             .where(F.col("jac") >= threshold))


def simhash_table(docs: DataFrame) -> DataFrame:
    return simhash_table_relational(docs)


# ------------------------------------------------------------ text analysis

def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish alnum-run count."""
    tok = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(tok).alias("n_ws_tokens"),
        F.expr("regexp_count(text, '[a-z0-9]+')").cast("int").alias("n_alnum_runs"),
        F.length("text").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Quality scoring: length/stopword/diversity ratios -> [0,1] score.
    Pure column math, rounded to 6dp for cross-engine stability."""
    docs = docs.select("doc_id", tokens(F.col("text")).alias("_tok"), "text")
    tok = F.col("_tok")
    n_tok = F.size(tok).cast("double")
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(tok, lambda t: F.array_contains(sw, t))).cast("double")
    n_uniq = F.size(F.array_distinct(tok)).cast("double")
    mean_len = (F.length(F.col("text")).cast("double") - (n_tok - 1)) / n_tok
    stop_ratio = r6(n_stop / n_tok)
    uniq_ratio = r6(n_uniq / n_tok)
    score = r6(
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(n_stop / n_tok * F.lit(5.0), F.lit(1.0)) * 0.2
        + n_uniq / n_tok * 0.4)
    return docs.select("doc_id", F.size(tok).alias("n_tokens"),
                       r6(mean_len).alias("mean_token_len"),
                       stop_ratio.alias("stopword_ratio"),
                       uniq_ratio.alias("unique_ratio"),
                       score.alias("quality"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID with deterministic tie-break
    (en > de > fr on equal scores)."""
    docs = docs.select("doc_id", tokens(F.col("text")).alias("_tok"))
    tok = F.col("_tok")
    scores = {}
    for lang in LANG_ORDER:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores[lang] = F.size(F.filter(tok, lambda t: F.array_contains(sw, t)))
    best = F.lit("en")
    best_score = scores["en"]
    for lang in LANG_ORDER[1:]:
        best = F.when(scores[lang] > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(scores[lang] > best_score, scores[lang]).otherwise(best_score)
    return docs.select("doc_id",
                       *[scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER],
                       best.alias("pred_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    staged = docs.select(
        "doc_id", F.transform(tokens(F.col("text")), token_hash).alias("hashes"))
    fp = F.aggregate(
        F.col("hashes"), F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(FP_MUL) + (h % F.lit(FP_MOD))) % F.lit(FP_MOD))
    return staged.select("doc_id", fp.alias("fp"))


# ------------------------------------------------------- embedding family

def _dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product — element order fixed so
    Spark and DuckDB produce bit-identical doubles."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: broadcast the tiny query side and scan
    the corpus once — the exact-baseline plan that still works at
    10^12 rows (cost = n_queries × scan, no shuffle of the corpus)."""
    from pyspark.sql.window import Window

    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    c = emb.select(F.col("vec_id").alias("nbr_id"), F.col("embedding").alias("c_emb"))
    scored = (c.join(F.broadcast(q), F.col("q_id") != F.col("nbr_id"))
               .select("q_id", "nbr_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "nbr_id", r6(F.col("sim")).alias("sim"), "rank"))


def lsh_bucket(emb_col: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-LSH bucket id from deterministic hyperplanes — the ANN scale
    path: bucket once, equi-join queries to their bucket only."""
    acc = F.lit(0)
    for p, w in enumerate(hyperplanes(n_planes, dim)):
        warr = F.array(*[F.lit(float(v)) for v in w])
        dot = F.aggregate(F.zip_with(emb_col, warr, lambda x, y: x.cast("double") * y),
                          F.lit(0.0), lambda a, v: a + v)
        acc = acc + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return acc


def ann_lsh_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
                 n_planes: int = 8) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket (equi-join on bucket id), exact cosine re-rank within."""
    from pyspark.sql.window import Window

    dim = 64
    bucketed = emb.select("vec_id", "embedding",
                          lsh_bucket(F.col("embedding"), n_planes, dim).alias("bucket"))
    q = bucketed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"), "bucket")
    c = bucketed.select(F.col("vec_id").alias("nbr_id"),
                        F.col("embedding").alias("c_emb"), "bucket")
    scored = (c.join(F.broadcast(q), "bucket")
               .where(F.col("q_id") != F.col("nbr_id"))
               .select("q_id", "nbr_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "nbr_id", r6(F.col("sim")).alias("sim"), "rank"))


IVF_K = 16          # coarse centroids
IVF_NPROBE = 4      # centroid lists probed per query


def ivf_centroids(k: int = IVF_K, dim: int = 64):
    """Deterministic coarse quantizer: k pseudo-random unit-cube
    centroids (the same linear-congruential stream as hyperplanes, so
    the SQL oracle regenerates them exactly). A trained quantizer drops
    in by replacing this table — the join shape is unchanged."""
    cents = []
    for c in range(k):
        v = [(((7 + (c * dim + i) * 2654435761) % 4294967296) % 2001 - 1000) / 1000.0
             for i in range(dim)]
        cents.append(v)
    return cents


def _centroid_dist2(emb_col: Column, cent: list) -> Column:
    carr = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(emb_col, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda a, v: a + v)


def with_ivf_list(emb: DataFrame, k: int = IVF_K, dim: int = 64,
                  out: str = "ivf_list") -> DataFrame:
    """Assign each vector to its nearest coarse centroid (IVF list id).
    Pure column math — at 10^12 rows this is a narrow map; the list id
    becomes the Iceberg partition key for the ANN index table.

    Distances are STAGED as named columns before the argmin — a
    when-chain over inlined 64-element aggregates re-evaluates every
    subtree and explodes codegen (the round-1 janino lesson)."""
    cents = ivf_centroids(k, dim)
    staged = emb.select(
        "*", *[_centroid_dist2(F.col("embedding"), cents[c]).alias(f"_d{c}")
               for c in range(k)])
    arr = F.array(*[F.struct(F.col(f"_d{c}").alias("d"), F.lit(c).alias("lid"))
                    for c in range(k)])
    # argmin with lowest-lid tie-break == ORDER BY d, lid
    return (staged.withColumn(out, F.element_at(F.array_sort(arr), 1)["lid"])
                  .drop(*[f"_d{c}" for c in range(k)]))


def ann_ivf_topk(emb: DataFrame, n_queries: int = 10, k: int = 3,
                 nprobe: int = IVF_NPROBE, n_lists: int = IVF_K) -> DataFrame:
    """IVF-flat approximate top-k: corpus bucketed by nearest coarse
    centroid; each query probes its ``nprobe`` nearest lists (equi-join
    on list id — never a corpus scan per query) and exact-cosine
    re-ranks within. The scale shape of FAISS-style IVF on Spark:
    candidate volume ~ nprobe/n_lists of the corpus per query."""
    from pyspark.sql.window import Window

    dim = 64
    cents = ivf_centroids(n_lists, dim)
    listed = with_ivf_list(emb, n_lists, dim).localCheckpoint()
    q0 = listed.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    # per-query nprobe nearest centroid lists; distances staged (see
    # with_ivf_list), k lists -> tiny explode
    q_staged = q0.select(
        "*", *[_centroid_dist2(F.col("q_emb"), cents[c]).alias(f"_d{c}")
               for c in range(n_lists)])
    probe_struct = F.array(*[
        F.struct(F.col(f"_d{c}").alias("d"), F.lit(c).alias("lid"))
        for c in range(n_lists)])
    q = (q_staged
         .select("q_id", "q_emb",
                 F.explode(F.slice(F.array_sort(probe_struct), 1, nprobe)).alias("p"))
         .select("q_id", "q_emb", F.col("p.lid").alias("ivf_list")))
    c = listed.select(F.col("vec_id").alias("nbr_id"),
                      F.col("embedding").alias("c_emb"), "ivf_list")
    scored = (c.join(F.broadcast(q), "ivf_list")
               .where(F.col("q_id") != F.col("nbr_id"))
               .select("q_id", "nbr_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("sim")))
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("nbr_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("q_id", "nbr_id", r6(F.col("sim")).alias("sim"), "rank"))


def embedding_neardup_pairs(emb: DataFrame, n_planes: int = 8,
                            threshold: float = 0.3,
                            max_bucket: int = MAX_LSH_BUCKET) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket candidate generation +
    exact cosine refine (the same candidate-pruning contract as the
    MinHash path — replicated exactly in the SQL oracle). Buckets past
    ``max_bucket`` are dropped (hot-bucket guard)."""
    bucketed = emb.select("vec_id", "embedding",
                          lsh_bucket(F.col("embedding"), n_planes).alias("bucket"))
    bucketed = cap_buckets(bucketed, ["bucket"], max_bucket)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (a.join(b, "bucket")
             .where(F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
                     r6(cosine(F.col("a.embedding"), F.col("b.embedding"))).alias("sim"))
             .where(F.col("sim") >= threshold))
