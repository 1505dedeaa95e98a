"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 against the
driver-provided parquet tables (documents / events / embeddings). Column
names are aliased identically on both sides — the driver's comparator sorts
columns by name and hashes values.

Portability rules used throughout (Spark <-> DuckDB):
  * counts / sums cast to BIGINT on both sides (DuckDB SUM(int) is HUGEINT);
  * no raw doubles in output except explicitly rounded ones;
  * md5 (both engines) instead of sha1 (Spark-only) for content keys;
  * window ties always broken by a unique id for determinism.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from deduplicate_spark.config import DedupConfig


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def docs_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View the documents table as single-turn transcripts — the bridge from
    the driver corpus to the engine's input contract."""
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


def docs_as_multiturn_transcripts(
    spark: SparkSession,
    sf_dir: str,
    words_per_turn: int = 12,
    replicate: int = 1,
    mutate: bool = False,
) -> DataFrame:
    """Documents chunked into ~words_per_turn-word turns — a deterministic
    multi-turn transcript corpus whose size scales with the sf dir. With
    ``replicate`` > 1, each doc is cloned under distinct conv_ids: exact
    copies by default (planted exact duplicates, exercising the cascade's
    dedup-before-kernel fast path), or with ``mutate=True`` each replica
    gets a per-replica token salt (planted NEAR duplicates, every doc
    unique -> the full MinHash kernel runs on all of them; use this for
    compute-bound scaling runs). All native (split + slice + posexplode)."""
    docs = _t(spark, sf_dir, "documents")
    if replicate > 1:
        docs = docs.crossJoin(
            spark.range(replicate).select(F.col("id").alias("rep"))
        ).select(
            F.concat_ws("#", F.col("doc_id").cast("string"), F.col("rep")).alias("doc_key"),
            (
                F.when(
                    F.lit(mutate) & (F.col("rep") > 0),
                    F.concat_ws(" ", "text", F.concat(F.lit("varianttok"), F.col("rep"))),
                ).otherwise(F.col("text"))
            ).alias("text"),
            "rep",
        )
    else:
        docs = docs.select(F.col("doc_id").cast("string").alias("doc_key"), "text")
    w = words_per_turn
    # let-binding trick: wrap the split in a 1-element array so the lambda
    # var w0 is evaluated once per row (the naive form re-splits per chunk)
    chunks = (
        f"transform(array(split(trim(text), '\\\\s+')), w0 -> "
        f"transform(sequence(0, greatest(cast(ceil(size(w0) / {w}.0) as int) - 1, 0)), "
        f"i -> concat_ws(' ', slice(w0, i * {w} + 1, {w}))))[0]"
    )
    return docs.select(
        F.col("doc_key").alias("conv_id"),
        F.posexplode(F.expr(chunks)).alias("turn_idx", "text"),
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.lit("user").alias("role"),
        "text",
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


# --------------------------------------------------------------------------
# S1/A4 stage-0 assembly analog over events: conversation per user, turns
# ordered by (ts, event_id)   [SURVEY S1; dupe_analysis.py:160-232]
# --------------------------------------------------------------------------
def q_stage0_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("user_id").cast("long").alias("conv_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("turns")
        )
        .select(
            "conv_id",
            F.concat_ws(
                "\n", F.transform(F.col("turns"), lambda t: t["event_type"])
            ).alias("doc_text"),
            F.size("turns").cast("long").alias("n_turns"),
        )
    )


SQL_STAGE0 = """
SELECT CAST(user_id AS BIGINT) AS conv_id,
       string_agg(event_type, chr(10) ORDER BY ts, event_id) AS doc_text,
       CAST(count(*) AS BIGINT) AS n_turns
FROM events GROUP BY user_id
"""


# --------------------------------------------------------------------------
# A1 collision-group prefilter  [dupe_analysis.py:391-407]
# --------------------------------------------------------------------------
def q_a1_collision_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars").isNotNull())
        .groupBy(F.col("n_chars").cast("long").alias("size_key"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .filter(F.col("n_members") > 1)
    )


SQL_A1 = """
SELECT CAST(n_chars AS BIGINT) AS size_key, CAST(count(*) AS BIGINT) AS n_members
FROM documents WHERE n_chars IS NOT NULL
GROUP BY n_chars HAVING count(*) > 1
"""


# --------------------------------------------------------------------------
# J1 semi-join to collision groups  [dupe_analysis.py:395-406]
# --------------------------------------------------------------------------
def q_j1_semi_join_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hot = (
        docs.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c > 1")
        .select("n_chars")
    )
    return docs.join(hot, "n_chars", "left_semi").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("size_key"),
    )


SQL_J1 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS size_key
FROM documents
WHERE n_chars IN (SELECT n_chars FROM documents GROUP BY n_chars HAVING count(*) > 1)
"""


# --------------------------------------------------------------------------
# J5 anti-join: rows NOT in any collision group  [deduplicate.py:593-597]
# --------------------------------------------------------------------------
def q_j5_anti_join_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hot = (
        docs.groupBy("n_chars")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter("c > 1")
        .select("n_chars")
    )
    return docs.join(hot, "n_chars", "left_anti").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )


SQL_J5 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE n_chars NOT IN (SELECT n_chars FROM documents GROUP BY n_chars HAVING count(*) > 1)
"""


# --------------------------------------------------------------------------
# A2 duplicate-group report  [dupe_analysis.py:532-562]
# --------------------------------------------------------------------------
def q_a2_dup_group_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.min("event_id").cast("long").alias("cluster_id"),
        )
        .filter(F.col("n_members") > 1)
    )


SQL_A2 = """
SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(min(event_id) AS BIGINT) AS cluster_id
FROM events GROUP BY user_id, event_type HAVING count(*) > 1
"""


# --------------------------------------------------------------------------
# G1 exact content clusters  [dupe_analysis.py:545-552]
# --------------------------------------------------------------------------
def q_g1_exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn("content_key", F.md5("text"))
    w = Window.partitionBy("content_key")
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.count(F.lit(1)).over(w).alias("_n"),
            F.min("doc_id").over(w).cast("long").alias("cluster_id"),
        )
        .filter(F.col("_n") > 1)
        .select("doc_id", "cluster_id")
    )


SQL_G1 = """
WITH keyed AS (SELECT doc_id, md5(text) AS content_key FROM documents),
grp AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY content_key) AS n,
         min(doc_id) OVER (PARTITION BY content_key) AS cluster_id
  FROM keyed)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
FROM grp WHERE n > 1
"""


# --------------------------------------------------------------------------
# J4 merge-dedup union  [dupe_analysis.py:454-469]
# --------------------------------------------------------------------------
def q_j4_union_dedup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    batch1 = docs.filter(F.col("doc_id") % 2 == 0)
    batch2 = docs  # overlaps batch1 — first-writer-wins on doc_id
    return (
        batch1.unionByName(batch2)
        .dropDuplicates(["doc_id"])
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


SQL_J4 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(min(n_chars) AS BIGINT) AS n_chars
FROM (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, n_chars FROM documents
) GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# O1 canonical election  [deduplicate.py:269-323]
# --------------------------------------------------------------------------
def q_o1_canonical_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        "source",
        F.when(F.row_number().over(w) == 1, F.lit("keep"))
        .otherwise(F.lit("delete"))
        .alias("action"),
    )


SQL_O1 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
       CASE WHEN row_number() OVER (PARTITION BY lang, source
                                    ORDER BY n_chars DESC, doc_id ASC) = 1
            THEN 'keep' ELSE 'delete' END AS action
FROM documents
"""


# --------------------------------------------------------------------------
# O3/top-k: top-3 events by value per type  [deduplicate.py:697 sorted output]
# --------------------------------------------------------------------------
def q_o3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            "event_type",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .withColumn("rnk", F.col("rnk").cast("long"))
    )


SQL_O3 = """
SELECT CAST(event_id AS BIGINT) AS event_id, event_type, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT event_id, event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk
  FROM events)
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# F1 exclude filter  [dupe_analysis.py:29-30, 179-181]
# --------------------------------------------------------------------------
def q_f1_exclude_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.filter(
        (~F.col("source").isin("src0")) & (F.col("lang") != "zh")
    ).select(F.col("doc_id").cast("long").alias("doc_id"))


SQL_F1 = """
SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
WHERE source NOT IN ('src0') AND lang != 'zh'
"""


# --------------------------------------------------------------------------
# A3/A4 hierarchical rollup [deduplicate.py:133-200]: stats per prefix of a
# synthesized source/lang/doc hierarchy, all depths in one shuffle
# --------------------------------------------------------------------------
def q_a4_group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        F.concat_ws(
            "/", "source", "lang", F.col("doc_id").cast("string")
        ).alias("conv_id"),
        F.col("n_chars").cast("long").alias("total_len"),
    )
    from deduplicate_spark.operators.rollup import prefix_explode

    return (
        prefix_explode(docs)
        .groupBy("group_prefix")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("total_len").cast("long").alias("total_len_sum"),
        )
    )


SQL_A4 = """
WITH base AS (
  SELECT source || '/' || lang || '/' || CAST(doc_id AS VARCHAR) AS conv_id,
         CAST(n_chars AS BIGINT) AS total_len
  FROM documents),
exploded AS (
  SELECT b.total_len, u.group_prefix
  FROM base b,
       unnest(list_transform(
         range(1, greatest(len(string_split(b.conv_id, '/')) - 1, 1) + 1),
         n -> array_to_string(string_split(b.conv_id, '/')[1:n], '/')
       )) AS u(group_prefix))
SELECT group_prefix, CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(total_len) AS BIGINT) AS total_len_sum
FROM exploded GROUP BY group_prefix
"""


# --------------------------------------------------------------------------
# Text analysis: token count  (training-data pipeline op)
# --------------------------------------------------------------------------
def q_tx_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long")
        .alias("n_tokens"),
    )


SQL_TX_TOKENS = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
FROM documents
"""


# --------------------------------------------------------------------------
# Text analysis: quality heuristics (length / word stats / stopword ratio)
# --------------------------------------------------------------------------
def q_tx_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    stop = F.regexp_count("text", F.lit(r"\b(the|a)\b"))
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars_m"),
        toks.cast("long").alias("n_tokens"),
        stop.cast("long").alias("n_stopwords"),
        (F.length("text") >= 100).alias("long_enough"),
    )


SQL_TX_QUALITY = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_m,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT) AS n_stopwords,
       length(text) >= 100 AS long_enough
FROM documents
"""


# --------------------------------------------------------------------------
# Dedup: word-3-gram Jaccard near-dup pairs (native arrays both engines).
# Candidate prefilter: each doc publishes its K lexicographically-smallest
# gram md5s (a deterministic MinHash); candidates = docs sharing any
# published key (equi-join). P(miss a true J>=0.6 pair) = (1-J)^K < 1e-3 at
# K=8. Both the old inequality join (BNL, O(n^2)) and length-bucketing
# (near-quadratic within buckets) die at scale; this stays ~linear.
# --------------------------------------------------------------------------
_JACCARD_THRESHOLD = 0.6
_MINGRAM_K = 8


def q_dd_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Count-based Jaccard: gram ARRAYS never enter a shuffle. Each doc's
    # distinct grams are hashed to longs and exploded once; candidate pairs
    # (from the min-gram prefilter) are joined to the exploded table twice
    # — first on a's doc_id, then on the composite (b, gram_hash), which
    # distributes hot grams across pairs — and Jaccard falls out of
    # |A∩B| / (|A| + |B| - |A∩B|). Shuffled rows are 3 longs wide instead
    # of two whole-document gram arrays.
    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        # trigrams via arrays_zip of three shifted slices: every argument is
        # evaluated ONCE per row. The naive transform(sequence(...), i ->
        # slice(split(text), ...)) form re-runs the regex split per element
        # (O(words^2) per doc) — measured 6x slower at sf0.1.
        F.array_distinct(
            F.expr(
                "transform(arrays_zip("
                "slice(split(trim(text), '\\\\s+'), 1, greatest(size(split(trim(text), '\\\\s+')) - 2, 1)), "
                "slice(split(trim(text), '\\\\s+'), 2, greatest(size(split(trim(text), '\\\\s+')) - 2, 1)), "
                "slice(split(trim(text), '\\\\s+'), 3, greatest(size(split(trim(text), '\\\\s+')) - 2, 1))), "
                "s -> concat_ws(' ', s['0'], s['1'], s['2']))"
            )
        ).alias("grams"),
    ).localCheckpoint(eager=False)  # parsed once; feeds keyed + exploded branches
    exploded = grams.select(
        "doc_id",
        F.explode(F.transform("grams", lambda g: F.xxhash64(g))).alias("gram_hash"),
    )
    sizes = exploded.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    keyed = grams.select(
        "doc_id",
        F.explode(
            F.slice(
                F.array_sort(F.transform("grams", lambda g: F.md5(g))),
                1,
                _MINGRAM_K,
            )
        ).alias("min_gram"),
    )
    l = keyed.alias("l")
    r = keyed.alias("r")
    cand = (
        l.join(r, "min_gram")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    ga = exploded.select(F.col("doc_id").alias("a"), "gram_hash")
    gb = exploded.select(F.col("doc_id").alias("b"), "gram_hash")
    inter = (
        cand.join(ga, "a")
        .join(gb, ["b", "gram_hash"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("n_grams").alias("n_a")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n_grams").alias("n_b")), "b")
        .filter(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            >= _JACCARD_THRESHOLD
        )
        .select("a", "b")
    )


SQL_DD_NGRAM = rf"""
WITH grams AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 1)),
           i -> array_to_string((regexp_split_to_array(trim(text), '\s+'))[i+1:i+3], ' ')
         )) AS grams
  FROM documents),
keyed AS (
  SELECT g.doc_id, g.grams, u.min_gram
  FROM grams g,
       unnest(list_sort(list_transform(g.grams, x -> md5(x)))[1:{_MINGRAM_K}]) AS u(min_gram)),
cand AS (
  SELECT l.doc_id AS a, r.doc_id AS b,
         first(l.grams) AS grams_a, first(r.grams) AS grams_b
  FROM keyed l JOIN keyed r USING (min_gram)
  WHERE l.doc_id < r.doc_id
  GROUP BY l.doc_id, r.doc_id)
SELECT a, b FROM cand
WHERE len(list_intersect(grams_a, grams_b)) * 1.0
      / len(list_distinct(list_concat(grams_a, grams_b))) >= {_JACCARD_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k  (embeddings table)
# --------------------------------------------------------------------------
_ANN_K = 5
_ANN_QUERIES = 5


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    queries = emb.filter(F.col("vec_id") < _ANN_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    scored = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (dot / (norm(F.col("qv")) * norm(F.col("v")))).alias("_cs"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _ANN_K)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), F.col("rnk").cast("long"))
    )


SQL_ANN = f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < {_ANN_QUERIES}),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_cosine_similarity(q.qv, e.embedding) AS cs
  FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.q_id),
ranked AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cs DESC, vec_id ASC) AS rnk
  FROM scored)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS neighbor_id,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_ANN_K}
"""


# --------------------------------------------------------------------------
# Non-SQL-expressible ops (rows-only driver check): the engine itself
# --------------------------------------------------------------------------
def q_dd_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash/LSH/SimHash/CC pipeline over documents-as-transcripts."""
    from deduplicate_spark.pipeline import run_pipeline

    turns = docs_as_transcripts(spark, sf_dir)
    res = run_pipeline(spark, turns, DedupConfig())
    return res.clusters.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def q_dd_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deduplicate_spark.pipeline import run_pipeline

    turns = docs_as_transcripts(spark, sf_dir)
    res = run_pipeline(spark, turns, DedupConfig())
    return res.actions.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("canonical_conv_id").cast("long").alias("canonical_doc_id"),
        "action",
    )


def q_dd_actions_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """complete_hash-mode actions WITH a full SQL oracle (VERDICT r1 #8):
    exact-only clusters + canonical election are SQL-expressible, so this
    turns the engine's strict mode (dupe_analysis.py:622-633 analog) into a
    hash-checked row. Dupes are planted by unioning a re-keyed copy of the
    corpus (the raw table has no exact text dupes at small sf)."""
    from deduplicate_spark.pipeline import run_pipeline

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )
    both = docs.unionByName(
        docs.select((F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text")
    )
    turns = both.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        "text",
        F.lit("").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    res = run_pipeline(spark, turns, DedupConfig(complete_hash=True))
    return res.actions.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("canonical_conv_id").cast("long").alias("canonical_doc_id"),
        "action",
    )


# cluster label and canonical are the component's min conv_id, which is a
# STRING min in the engine — the oracle reproduces the varchar ordering
SQL_DD_ACTIONS_EXACT = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text
  FROM documents WHERE length(trim(text)) > 0),
both_t AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 1000000, text FROM base),
grp AS (
  SELECT doc_id,
         count(*) OVER (PARTITION BY text) AS n,
         min(CAST(doc_id AS VARCHAR)) OVER (PARTITION BY text) AS canon_str
  FROM both_t)
SELECT doc_id,
       CAST(canon_str AS BIGINT) AS cluster_id,
       CAST(canon_str AS BIGINT) AS canonical_doc_id,
       CASE WHEN CAST(doc_id AS VARCHAR) = canon_str THEN 'keep' ELSE 'delete' END AS action
FROM grp WHERE n > 1
"""


def q_dd_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deduplicate_spark.operators.assembly import assemble_docs
    from deduplicate_spark.operators.lsh import candidate_pairs
    from deduplicate_spark.operators.minhash import compute_signatures
    from deduplicate_spark.operators.simhash import confirm_pairs

    cfg = DedupConfig()
    docs = assemble_docs(docs_as_transcripts(spark, sf_dir), cfg)
    sigs = compute_signatures(docs, cfg)
    cand = candidate_pairs(sigs, cfg)
    return confirm_pairs(cand, sigs, config=cfg).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_dd_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from deduplicate_spark.operators.assembly import assemble_docs
    from deduplicate_spark.operators.substring import substring_pairs

    cfg = DedupConfig(enable_substring_pass=True)
    docs = assemble_docs(docs_as_transcripts(spark, sf_dir), cfg)
    return substring_pairs(docs, cfg).select(
        F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stage0_assemble": q_stage0_assemble,
        "a1_collision_groups": q_a1_collision_groups,
        "j1_semi_join_collisions": q_j1_semi_join_collisions,
        "j5_anti_join_unique": q_j5_anti_join_unique,
        "a2_dup_group_report": q_a2_dup_group_report,
        "g1_exact_clusters": q_g1_exact_clusters,
        "j4_union_dedup_merge": q_j4_union_dedup_merge,
        "o1_canonical_election": q_o1_canonical_election,
        "a4_group_rollup": q_a4_group_rollup,
        "o3_topk_per_group": q_o3_topk_per_group,
        "f1_exclude_filter": q_f1_exclude_filter,
        "tx_token_count": q_tx_token_count,
        "tx_quality": q_tx_quality,
        "dd_ngram_jaccard_pairs": q_dd_ngram_jaccard_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "dd_actions_exact": q_dd_actions_exact,
        # engine-native (no SQL oracle -> rows-only check)
        "dd_minhash_clusters": q_dd_minhash_clusters,
        "dd_actions": q_dd_actions,
        "dd_simhash_pairs": q_dd_simhash_pairs,
        "dd_substring_pairs": q_dd_substring_pairs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stage0_assemble": SQL_STAGE0,
        "a1_collision_groups": SQL_A1,
        "j1_semi_join_collisions": SQL_J1,
        "j5_anti_join_unique": SQL_J5,
        "a2_dup_group_report": SQL_A2,
        "g1_exact_clusters": SQL_G1,
        "j4_union_dedup_merge": SQL_J4,
        "o1_canonical_election": SQL_O1,
        "a4_group_rollup": SQL_A4,
        "o3_topk_per_group": SQL_O3,
        "f1_exclude_filter": SQL_F1,
        "tx_token_count": SQL_TX_TOKENS,
        "tx_quality": SQL_TX_QUALITY,
        "dd_ngram_jaccard_pairs": SQL_DD_NGRAM,
        "ann_cosine_topk": SQL_ANN,
        "dd_actions_exact": SQL_DD_ACTIONS_EXACT,
    }
