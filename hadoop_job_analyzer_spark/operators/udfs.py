"""Category J — UDF / UDAF / UDTF surface (SURVEY.md §2.J).

Reference analog: the framework-detection plugins — the reference's
only extension point, a per-record Python function [R-M]. Spark-native
spectrum, slowest→fastest:

- row-at-a-time Python UDF (``udf_python_scalar``): pickled per-row
  round trips — demonstrated because the surface must exist, but
  deliberately the ONLY hot-path-shaped one here;
- Arrow-vectorized pandas UDFs (scalar / grouped-agg / applyInPandas):
  columnar batches over Arrow, 10-100× the row UDF;
- Python UDTF (row-expanding, Spark 4) and SQL-registered UDFs.

Float determinism for Python-side aggregation: ``math.fsum`` (exactly
rounded) makes the result independent of pandas/numpy summation order,
and equals the decimal-policy oracle whenever addends have ≤6 decimal
places (l_quantity is integral; prices have 2dp).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..catalog import load_table
from ..registry import query

_BAND_CASE_SQL = """
CASE WHEN l_discount >= 0.08 THEN 'deep'
     WHEN l_discount >= 0.04 THEN 'mid'
     WHEN l_discount > 0.0 THEN 'light'
     ELSE 'none' END
"""


def _discount_band(d: float) -> str:
    if d >= 0.08:
        return "deep"
    if d >= 0.04:
        return "mid"
    if d > 0.0:
        return "light"
    return "none"


@query(
    "udf_python_scalar",
    oracle=f"""
SELECT l_orderkey, l_linenumber, {_BAND_CASE_SQL} AS discount_band
FROM lineitem
""",
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the reference's plugin shape, verbatim).

    Kept for surface parity; the CASE-expression twin in the oracle is
    what production code should use (JVM, codegen'd, ~100× faster).
    """
    band = F.udf(_discount_band, StringType())
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", band(F.col("l_discount")).alias("discount_band")
    )


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price
FROM lineitem
""",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF: columnar batches, element-wise IEEE
    math → exactly equal to the JVM expression."""

    @F.pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price(F.col("l_extendedprice"), F.col("l_discount")).alias("net_price"),
    )


@query(
    "udaf_pandas_grouped",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: quantity-weighted mean price.

    fsum (exactly-rounded) makes the Python-side sums order-independent
    and equal to the oracle's exact decimal sums (addends have ≤2dp).
    """

    @F.pandas_udf("double")
    def wmean(price: pd.Series, qty: pd.Series) -> float:
        return math.fsum(price * qty) / math.fsum(qty)

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wmean(F.col("l_extendedprice"), F.col("l_quantity")).alias("weighted_avg_price")
    )


@query(
    "udtf_apply_in_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND((l_extendedprice - AVG(l_extendedprice) OVER (PARTITION BY l_returnflag))
             / STDDEV_SAMP(l_extendedprice) OVER (PARTITION BY l_returnflag), 6) AS price_z
FROM lineitem
""",
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-group z-score (whole group in, whole group out).

    Rounded to 6: z is O(1) and both engines' mean/std agree to ~1e-12
    relative, so the rounding absorbs algorithmic (pairwise vs
    sequential) summation differences.
    """

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sd = pdf["l_extendedprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "price_z": ((pdf["l_extendedprice"] - mu) / sd).round(6),
            }
        )

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").applyInPandas(
        zscore, schema="l_orderkey long, l_linenumber int, price_z double"
    )


@query(
    "udtf_python",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
SELECT doc_id, t[i] AS token, CAST(i AS INTEGER) AS pos
FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)
""",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding Python UDTF (Spark 4): text → (token, pos) rows.

    The UDTF is the generalization of the reference's one-record-in /
    many-metrics-out plugins to one-in/many-out.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield tok, i

    spark.udtf.register("hja_split_tokens", SplitTokens)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("hja_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.pos "
        "FROM hja_docs_udtf d, LATERAL hja_split_tokens(d.text) t"
    )


@query(
    "udf_sql_registered",
    oracle=f"""
SELECT {_BAND_CASE_SQL.strip()} AS discount_band, COUNT(*) AS n
FROM lineitem
GROUP BY 1
""",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register a Python UDF into the SQL catalog and call it from SQL text."""
    spark.udf.register("hja_discount_band", _discount_band, StringType())
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("hja_lineitem_udf")
    return spark.sql(
        "SELECT hja_discount_band(l_discount) AS discount_band, COUNT(*) AS n "
        "FROM hja_lineitem_udf GROUP BY 1"
    )


@query(
    "udtf_cogroup_pandas",
    oracle="""
SELECT o.o_orderkey,
       COUNT(l.l_orderkey) AS n_lines,
       CAST(COALESCE(SUM(l.l_quantity), 0.0) AS DOUBLE) AS sum_qty,
       o.o_totalprice
FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def udtf_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — the two-table Python kernel: orders
    and lineitems co-partitioned by orderkey arrive as a PAIR of
    pandas frames per key group, reconciled in Python (here: per-order
    line count + quantity mass next to the order header, including
    line-less orders — the custom-merge shape you reach for when the
    reconciliation logic won't express as a join condition).

    Both sides shuffle once on the cogroup key, then Arrow ships each
    aligned group pair to Python — at 100 TB this is the escape hatch
    for per-entity cross-table logic (matching engines, SCD merges)
    with the co-partitioning handled by Spark, not the kernel.

    GRAIN LESSON (measured): cogrouping on the finest key (orderkey)
    makes one Python invocation per ORDER — 37 k tiny frames, 40 s at
    sf0.01, pure per-call overhead. Cogroup on a BUCKET of keys
    instead (orderkey % 32) and do the per-order work vectorized
    inside the kernel (pandas groupby + merge): same result, bounded
    invocation count, 20× faster — and the shape that survives a
    100 TB shuffle (tune bucket count to executor memory; both tables
    co-partition on the same bucket expression). Quantities are
    integral doubles, so sums are exact and order-free.
    """

    def reconcile(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(orders_pdf) == 0:
            return pd.DataFrame(
                {"o_orderkey": [], "n_lines": [], "sum_qty": [], "o_totalprice": []}
            )
        per_order = (
            lines_pdf.groupby("l_orderkey")["l_quantity"].agg(["size", "sum"])
            if len(lines_pdf)
            else pd.DataFrame(columns=["size", "sum"])
        )
        merged = orders_pdf.merge(
            per_order, left_on="o_orderkey", right_index=True, how="left"
        )
        return pd.DataFrame(
            {
                "o_orderkey": merged["o_orderkey"],
                "n_lines": merged["size"].fillna(0).astype("int64"),
                "sum_qty": merged["sum"].fillna(0.0).astype("float64"),
                "o_totalprice": merged["o_totalprice"],
            }
        )

    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice", (F.col("o_orderkey") % 32).alias("bkt"))
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", (F.col("l_orderkey") % 32).alias("bkt")
    )
    return (
        o.groupBy("bkt")
        .cogroup(l.groupBy("bkt"))
        .applyInPandas(
            reconcile,
            schema="o_orderkey long, n_lines long, sum_qty double, o_totalprice double",
        )
    )


@query(
    "udf_map_in_arrow",
    oracle="""
SELECT vec_id,
       ROUND(SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6)
         AS l2_norm
FROM embeddings
""",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy batch surface below mapInPandas: the
    kernel receives pyarrow RecordBatches directly (no pandas
    conversion), flattens the fixed-width list column into a numpy
    matrix view, and emits L2 norms. For numeric array columns this
    skips the pandas object-boxing mapInPandas pays per list cell —
    the right lane for 100 TB embedding jobs where the per-batch
    overhead is the bottleneck.

    Accumulation is dim-SEQUENTIAL (same trick as the kNN kernel) so
    every norm bit-matches DuckDB's left-to-right list_dot_product
    before the shared 1e-6 rounding.
    """
    import numpy as np
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            ids = batch.column(batch.schema.get_field_index("vec_id"))
            emb = batch.column(batch.schema.get_field_index("embedding"))
            flat = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            m = flat.reshape(n, -1)
            acc = m[:, 0] * m[:, 0]
            for i in range(1, m.shape[1]):
                acc = acc + m[:, i] * m[:, i]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(np.round(np.sqrt(acc), 6), type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(norms, schema="vec_id long, l2_norm double")


@query(
    "udtf_python_analyze",
    oracle="""
SELECT event_id, json_extract_string(props, '$.k') AS k_value
FROM events
""",
)
def udtf_python_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()`): the output schema
    is computed at PLAN TIME from the constant field-name arguments —
    `extract_json(props, 'k')` emits a `k_value` column, a different
    field list would emit different columns, with no code change. This
    is the plugin surface the static-schema UDTFs (udtf_python) can't
    express: schema-on-demand extraction where the caller names the
    fields.

    analyze() receives AnalyzeArgument metadata (value=constant,
    dataType) and returns the StructType; eval() then parses each JSON
    once and yields the requested fields as strings (matching
    get_json_object/json_extract_string semantics on both engines).
    Row-at-a-time Python is the point of the demo, not the hot path —
    the JVM equivalent for production is fn_json's get_json_object.
    """
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ExtractJson:
        @staticmethod
        def analyze(js: AnalyzeArgument, *fields: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for f in fields:
                schema = schema.add(f"{f.value}_value", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, js: str, *fields: str):
            try:
                obj = _json.loads(js) if js is not None else {}
            except ValueError:
                obj = {}
            yield tuple(
                None if obj.get(f) is None else str(obj[f]) for f in fields
            )

    spark.udtf.register("hja_extract_json", udtf(ExtractJson))
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("hja_events_udtf")
    return spark.sql(
        "SELECT e.event_id, t.k_value "
        "FROM hja_events_udtf e, LATERAL hja_extract_json(e.props, 'k') t"
    )


@query(
    "udf_pandas_iter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
FROM lineitem
""",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-batches pandas UDF (SCALAR_ITER) — the third Arrow
    UDF shape beside per-batch scalar (udf_pandas_scalar) and
    mapInPandas (udf_map_in_arrow): the worker sees an iterator over
    ALL of its partition's Arrow batches in one Python process, which
    is the shape you want when per-worker setup is expensive (load a
    model/tokenizer ONCE before the loop, then stream batches through
    it). Here the "expensive init" is a trivial constant so the math
    stays an exact IEEE expression; the seam where a real model load
    goes is marked.
    """
    # typing.Iterator/Tuple (module-level imports, not builtins): the
    # pandas_udf signature parser evaluates the annotation strings in
    # the function's MODULE globals and only recognizes the
    # typing-module spellings.
    @F.pandas_udf("double")
    def charge(
        batches: Iterator[Tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        one = 1.0  # per-worker init happens HERE, once per executor task
        for price, disc, tax in batches:
            yield price * (one - disc) * (one + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge(F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")).alias("charge"),
    )
