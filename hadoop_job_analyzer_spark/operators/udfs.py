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
