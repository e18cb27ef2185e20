"""Record-linkage operators (EXT): token-blocked edit-distance
similarity join and learned-vocabulary coverage scoring.

Reference parity: the reference (music_db.sql:6-106) stores free-text
names (Artist.artist_name, Song.title); a user migrating its catalog
needs fuzzy matching over those columns to merge near-duplicate
entities. Re-expressed Spark-first over the TPC-H-ish part/documents
tables the driver provides.

Scale notes:
* x_editdist_join never does an all-pairs comparison. It first
  collapses to DISTINCT names (cardinality = entity vocabulary, orders
  of magnitude below row count at 100 TB), then generates candidate
  pairs only for names sharing >=1 whitespace token — an equi-join on
  the token, the same blocking shape as the n-gram Jaccard dedup
  (operators/dedup.py). Hot blocking tokens would be capped exactly like
  MAX_SHINGLE_FREQ there; the 16-word synthetic vocabulary needs no cap.
  levenshtein() runs only on surviving candidates, JVM-side codegen.
* x_vocab_coverage is two passes over the exploded token stream: one
  partial-aggregable frequency count to learn the top-K vocabulary
  (bounded output: K rows), then one pass joining the stream against the
  BROADCAST vocab. All arithmetic that crosses engines is integer sums
  and single divisions — no float accumulation order to diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.relational import _t
from ..registry import register

EDIT_MAX = 4  # max levenshtein distance for a reported candidate pair


@register(
    "x_editdist_join",
    tags=("EXT", "X2", "F3", "J9"),
    oracle=f"""
        WITH names AS (
            SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM part GROUP BY p_name
        ),
        toks AS (
            SELECT DISTINCT p_name, tok FROM (
                SELECT p_name, unnest(string_split(p_name, ' ')) AS tok
                FROM names
            )
        ),
        cand AS (
            SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
            FROM toks a JOIN toks b
              ON a.tok = b.tok AND a.p_name < b.p_name
        )
        SELECT c.name_a, c.name_b,
               CAST(levenshtein(c.name_a, c.name_b) AS BIGINT) AS edit_dist,
               na.n_parts AS parts_a, nb.n_parts AS parts_b
        FROM cand c
        JOIN names na ON c.name_a = na.p_name
        JOIN names nb ON c.name_b = nb.p_name
        WHERE levenshtein(c.name_a, c.name_b) <= {EDIT_MAX}
        ORDER BY name_a, name_b
    """,
)
def x_editdist_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity self-join over part names (record
    linkage / entity resolution candidates). Semantics: all unordered
    pairs of DISTINCT p_name values that (a) share at least one
    whitespace token — the blocking contract, which is also the
    scale-safe candidate generator — and (b) have levenshtein distance
    <= {EDIT_MAX}; each pair reports the distance and both names' part
    counts as linkage weights.

    Plan shape: groupBy(p_name) collapse -> token explode -> token
    equi-join (the only join that touches pair space) -> levenshtein on
    candidates only -> two broadcast joins to re-attach counts. The
    distinct-name frame is tiny relative to the base table at any scale,
    so every post-collapse join broadcasts."""
    names = (
        _t(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    toks = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("tok")
    ).distinct()
    a = toks.select(F.col("p_name").alias("name_a"), "tok")
    b = toks.select(F.col("p_name").alias("name_b"), "tok")
    cand = (
        a.join(b, ["tok"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    pairs = cand.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= EDIT_MAX
    ).select(
        "name_a",
        "name_b",
        F.levenshtein(F.col("name_a"), F.col("name_b")).cast("bigint").alias("edit_dist"),
    )
    counts_a = F.broadcast(
        names.select(F.col("p_name").alias("name_a"), F.col("n_parts").alias("parts_a"))
    )
    counts_b = F.broadcast(
        names.select(F.col("p_name").alias("name_b"), F.col("n_parts").alias("parts_b"))
    )
    return (
        pairs.join(counts_a, "name_a")
        .join(counts_b, "name_b")
        .select("name_a", "name_b", "edit_dist", "parts_a", "parts_b")
        .orderBy("name_a", "name_b")
    )


VOCAB_K = 16  # size of the learned vocabulary (top-K corpus tokens)
LOW_COVERAGE = 0.5  # per-doc coverage below this flags the doc


@register(
    "x_vocab_coverage",
    tags=("EXT", "X4", "A1", "J5"),
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        vocab AS (
            SELECT tok FROM toks GROUP BY tok
            ORDER BY COUNT(*) DESC, tok LIMIT {VOCAB_K}
        ),
        per_doc AS (
            SELECT t.doc_id, t.source,
                   COUNT(*) AS n_tok,
                   SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS n_in
            FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
            GROUP BY t.doc_id, t.source
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(SUM(n_in) AS BIGINT) AS in_vocab_tokens,
               round(CAST(SUM(n_in) AS DOUBLE) / SUM(n_tok), 6) AS coverage,
               CAST(SUM(CASE WHEN n_in * 2 < n_tok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_low_docs
        FROM per_doc GROUP BY source ORDER BY source
    """,
)
def x_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-vocabulary coverage: learn the top-{VOCAB_K} tokens of the
    corpus (frequency desc, token asc tie-break — a total order, so the
    cut is deterministic at every SF), then score each document's
    in-vocabulary token fraction and roll up per source: doc count,
    token totals, corpus coverage ratio, and how many docs fall below
    {LOW_COVERAGE} coverage (tokenizer-mismatch screening for a training
    pipeline).

    Cross-engine float determinism: coverage is ONE division of two
    exact integer sums (never an accumulated float), and the per-doc
    low-coverage test is the integer comparison 2*n_in < n_tok — no
    epsilon anywhere."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok"))
        .limit(VOCAB_K)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.coalesce(F.col("in_vocab"), F.lit(0))).alias("n_in"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_in").cast("bigint").alias("in_vocab_tokens"),
            F.round(
                F.sum("n_in").cast("double") / F.sum("n_tok"), 6
            ).alias("coverage"),
            F.sum((F.col("n_in") * 2 < F.col("n_tok")).cast("bigint"))
            .cast("bigint")
            .alias("n_low_docs"),
        )
        .orderBy("source")
    )
