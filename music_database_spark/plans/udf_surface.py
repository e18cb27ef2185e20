"""UDF/UDAF/grouped-map surface (SURVEY.md §2.9 D1/D2, §2.4 A9).

The reference's application layer is "required Python functions" that
were never checked in (music_db.pdf p.8); this module is the sanctioned
way those functions exist in a 100 TB Spark engine:

* scalar logic -> ``pandas_udf`` (Arrow-vectorized, ~10-100x the
  row-at-a-time ``F.udf`` path, which appears nowhere in this repo);
* custom aggregates -> GROUPED_AGG ``pandas_udf``;
* per-group procedural transforms -> ``applyInPandas`` (grouped map).

Each query keeps Python OFF the hot path until the data is already
filtered/projected to the minimum columns, so only the needed Arrow
batches cross the JVM<->Python boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..registry import register
from .relational import _t


# DataType instances (not DDL strings) keep these importable without an
# active SparkSession — the driver imports the registry before it builds one.
@pandas_udf(DoubleType())
def net_price(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized price normalization: charged amount after discount+tax.
    Pure elementwise double arithmetic, same operation order as the SQL
    expression -> bit-identical doubles, no rounding needed (rounding
    would HURT: numpy rounds half-even, DuckDB half-away)."""
    return extended * (1.0 - discount) * (1.0 + tax)


@register(
    "x_pandas_udf",
    tags=("EXT", "D1"),
    oracle="""
        SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
               l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        ORDER BY orderkey, linenumber
    """,
)
def x_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (D1): per-lineitem charged amount. The sargable
    ship-date filter runs JVM-side BEFORE the UDF, so Arrow only carries
    one year of rows into Python. Elementwise double ops are
    order-independent -> full DuckDB oracle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        net_price("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    ).orderBy("orderkey", "linenumber")


@pandas_udf(DoubleType())
def mean_vec_norm(emb: pd.Series) -> float:
    """GROUPED_AGG UDAF (A9): mean L2 norm of the group's embeddings.
    numpy over the whole Arrow batch; no per-row Python."""
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in emb])
    if mat.size == 0:
        return 0.0
    return float(np.sqrt((mat * mat).sum(axis=1)).mean())


@register("x_udaf_norm", tags=("EXT", "A9"), oracle=None)
def x_udaf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate over a vector column: per-label mean embedding
    norm. Rows-only check (float mean over a group is partition-order
    dependent in the last ulp); x_vec_norm is the decimal-stabilized,
    oracle-checked sibling."""
    emb = _t(spark, sf_dir, "embeddings")
    # A GROUPED_AGG pandas UDF cannot share an agg() with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT); the group count joins in
    # from a second tiny aggregate on the same key.
    norms = emb.groupBy("label").agg(F.round(mean_vec_norm("embedding"), 4).alias("mean_norm"))
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return norms.join(counts, "label").select("label", "n", "mean_norm").orderBy("label")


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-event-type z-score, population std (ddof=0). Deterministic given
    the group's rows; numpy reduces over the whole group at once."""
    v = pdf["value"].to_numpy(dtype=np.float64)
    mu = v.mean()
    sd = v.std(ddof=0)
    z = np.zeros_like(v) if sd == 0.0 else (v - mu) / sd
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": np.round(z, 4)}
    )


@register("x_grouped_map", tags=("EXT", "D2"), oracle=None)
def x_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map transform (D2): applyInPandas z-scores event values
    within each event_type. Each group arrives as one pandas frame —
    the shape for per-group model scoring / normalization at scale
    (groups shuffle-partition across executors). Rows-only: float mean
    over a group depends on summation order."""
    events = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = events.groupBy("event_type").applyInPandas(
        _zscore_group, "event_id bigint, event_type string, zscore double"
    )
    return out.orderBy("event_id")


@register(
    "x_python_udtf",
    tags=("EXT", "D3", "D1"),
    oracle="""
        WITH t AS (
            SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents
        ), c AS (
            SELECT doc_id, len(toks) AS n,
                   unnest(range(0, CAST(ceil(len(toks) / 32.0) AS INTEGER))) AS chunk_id
            FROM t WHERE len(toks) > 0
        )
        SELECT chunk_id,
               COUNT(*) AS n_docs,
               CAST(SUM(LEAST(32, n - 32 * chunk_id)) AS BIGINT) AS total_tokens
        FROM c GROUP BY chunk_id ORDER BY chunk_id
    """,
)
def x_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The class-based Python UDTF surface (Spark 3.5+): a table function
    lateral-joined per input row, yielding one row per 32-token chunk.
    This exercises the genuine @udtf API — eval() generator, lateral
    correlation, registration — which x_chunking deliberately avoids (its
    sequence/slice array form stays in codegen and is the production
    path; SURVEY.md §2.9 D3). Python rows cross the Arrow boundary here,
    so the aggregate after the lateral join is the only shuffle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_tokens int")
    class ChunkCounter:
        def eval(self, text: str):
            if text is None:
                return
            toks = [t for t in text.split(" ") if t]
            for i in range(0, len(toks), 32):
                yield i // 32, len(toks[i : i + 32])

    spark.udtf.register("chunk_counter", ChunkCounter)
    _t(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql("""
        SELECT c.chunk_id,
               COUNT(*) AS n_docs,
               CAST(SUM(c.n_tokens) AS BIGINT) AS total_tokens
        FROM docs_udtf, LATERAL chunk_counter(text) c
        GROUP BY c.chunk_id ORDER BY c.chunk_id
    """)
