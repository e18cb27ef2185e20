"""CorpusPipeline — the user-facing API for the training-data pipeline
operators, parameterized over ANY documents DataFrame (id + text), not
just the driver's parquet table.

The registered driver queries (operators/pipeline.py, operators/dedup.py,
operators/textops.py) are the oracle-checked instantiations of these same
semantics over /root/testdata; this facade is what a user calls on their
own corpus. Agreement between the two surfaces is pinned in
tests/test_corpus_api.py.

Every method returns a lazy DataFrame — compose freely, nothing executes
until an action. All steps are Catalyst expression pipelines (map-only or
digest-keyed shuffles); the scale notes on the registered queries apply
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .operators.dedup import MAX_BAND_FREQ, shingle_frame, minhash_signature


class CorpusPipeline:
    """Fluent corpus-preparation API over a documents DataFrame.

    >>> pipe = CorpusPipeline(docs)              # docs: (doc_id, text, ...)
    >>> clean = pipe.exact_dedup()
    >>> pairs = CorpusPipeline(clean).near_dup_pairs(threshold=0.6)
    >>> train = pipe.with_split().filter("split = 'train'")
    """

    def __init__(self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self.docs = docs
        self.id_col = id_col
        self.text_col = text_col

    def _toks(self):
        return F.expr(f"filter(split({self.text_col}, ' '), t -> t != '')")

    # ---- deduplication ----------------------------------------------------

    def exact_dedup(self) -> DataFrame:
        """Keep the lowest id per identical text; the shuffle key is the
        16-byte md5 digest, never the document body."""
        w = W.partitionBy(F.md5(self.text_col)).orderBy(self.id_col)
        return (
            self.docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def near_dup_pairs(self, threshold: float = 0.6) -> DataFrame:
        """MinHash-LSH candidate pairs verified by exact shingle-Jaccard
        >= threshold. Banded buckets with a hot-bucket cap — candidates
        stay ~linear in corpus size (same spine as the registered
        x_dedup_minhash query). Returns (id_a, id_b, jaccard)."""
        sh = shingle_frame(self.docs, self.id_col, self.text_col).persist()
        # persisted: feeds the cap pass and both candidate-join sides
        bands = minhash_signature(sh).persist()
        sizes = bands.groupBy("band_id", "band_hash").agg(F.count(F.lit(1)).alias("bsz"))
        bands = bands.join(
            sizes.filter(F.col("bsz") <= MAX_BAND_FREQ).select("band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        cand = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        return (
            cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
            .withColumn("__inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                F.col("__inter") / (F.size("sh_a") + F.size("sh_b") - F.col("__inter")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
        )

    # ---- splits and sampling ----------------------------------------------

    def _bucket(self, salt: str = "") -> F.Column:
        key = (
            F.concat(F.lit(salt), F.col(self.id_col).cast("string"))
            if salt
            else F.col(self.id_col).cast("string")
        )
        return F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("int") % 100

    def with_split(self, train: int = 80, validation: int = 10) -> DataFrame:
        """Deterministic md5-bucket split column: content- and
        order-independent, so membership never moves as the corpus grows
        (semantics of the registered x_hash_split query)."""
        b = self._bucket()
        return self.docs.withColumn(
            "split",
            F.when(b < train, "train")
            .when(b < train + validation, "validation")
            .otherwise("test"),
        )

    def sample(self, rate_pct: int = 10, salt: str = "strat:") -> DataFrame:
        """Exact-rate deterministic sample (any grouping is stratified for
        free because selection is per-id): x_stratified_sample semantics."""
        return self.docs.filter(self._bucket(salt) < rate_pct)

    # ---- quality ----------------------------------------------------------

    def with_quality_flags(self) -> DataFrame:
        """Gopher-style repetition flags (x_repetition_filter semantics):
        `dropped` is true when the top token exceeds 30% of tokens or the
        duplicate-bigram fraction exceeds 20%. Integer cross-multiplied
        thresholds, all row-local HOF work."""
        d = self.docs.withColumn("__toks", self._toks())
        d = d.withColumn(
            "__max_cnt",
            F.expr(
                "array_max(transform(array_distinct(__toks),"
                " u -> size(filter(__toks, t -> t = u))))"
            ),
        ).withColumn(
            "__bigrams",
            F.when(
                F.size("__toks") >= 2,
                F.expr(
                    "transform(sequence(1, size(__toks) - 1),"
                    " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"
                ),
            ).otherwise(F.expr("array()")),
        )
        return (
            d.withColumn("n_tok", F.size("__toks"))
            .withColumn("__n_bi", F.size("__bigrams"))
            .withColumn("__n_dup", F.size("__bigrams") - F.size(F.array_distinct("__bigrams")))
            .withColumn(
                "dropped",
                (F.col("__max_cnt") * 10 > F.col("n_tok") * 3)
                | (F.col("__n_dup") * 5 > F.col("__n_bi")),
            )
            .drop("__toks", "__max_cnt", "__bigrams", "__n_bi", "__n_dup")
        )

    def redact(self, out_col: str = "text_redacted") -> DataFrame:
        """Replace email/phone patterns with typed placeholders
        (x_redact's expressions; patterns mean the same in Java regex and
        RE2)."""
        return self.docs.withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(self.text_col, r"[a-z0-9]+@[a-z]+\.[a-z]+", "<EMAIL>"),
                r"[0-9]{3}-[0-9]+",
                "<PHONE>",
            ),
        )

    # ---- batch preparation ------------------------------------------------

    def pack_sequences(self, window_tokens: int = 2048, shards: int = 8) -> DataFrame:
        """Greedy sequence packing into context windows, parallel per
        (shard) stream — x_seq_packing semantics with the shard key from
        the stable id. Adds (shard, bin)."""
        d = self.docs.withColumn("__n_tok", F.size(self._toks())).withColumn(
            "shard", F.col(self.id_col) % shards
        )
        w = (
            W.partitionBy("shard")
            .orderBy(self.id_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return (
            d.withColumn("__cum", F.sum("__n_tok").over(w))
            .withColumn("bin", F.expr(f"(__cum - __n_tok) div {window_tokens}"))
            .drop("__n_tok", "__cum")
        )
