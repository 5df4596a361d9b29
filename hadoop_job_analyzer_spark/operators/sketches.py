"""Category K4 — sketch operators (SURVEY.md §2.K4).

Probabilistic summaries a 100 TB pipeline uses where exact state is
too big. Spark ships HLL (`approx_count_distinct`, keyed as
`agg_approx_distinct`); this module adds a count-min sketch built and
queried entirely in DataFrame ops. The sketch itself is deterministic
(md5-keyed hash rows — the verified cross-engine bucket trick from
corpus.py), so unlike most sketch implementations it is exactly
reproducible on both engines and hash-matched end-to-end, error bars
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .corpus import _bucket, _o_bucket

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row (deliberately small so collisions occur
#              at test scale and the overcount column is non-trivial)


@query(
    "sketch_countmin",
    oracle=f"""
WITH cnt AS (
  SELECT token, COUNT(*) AS exact_n
  FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
), hrows AS (
  SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS r
), cells AS (
  SELECT r, {_o_bucket("token || '#' || r", _CMS_W)} AS b, SUM(exact_n) AS cell
  FROM cnt CROSS JOIN hrows
  GROUP BY 1, 2
)
SELECT c.token, c.exact_n, MIN(s.cell) AS cms_est,
       MIN(s.cell) - c.exact_n AS overcount
FROM cnt c
CROSS JOIN hrows r
JOIN cells s ON s.r = r.r AND s.b = {_o_bucket("c.token || '#' || r.r", _CMS_W)}
GROUP BY c.token, c.exact_n
""",
)
def sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream: build a d=4 × w=64 CMS,
    then read every vocabulary term back out of it — returning exact
    count, CMS estimate, and the (provably ≥ 0) overcount so the
    result exhibits the sketch's error behavior, not just its API.

    Build shape: token counts first (the shuffle is vocabulary-sized —
    map-side partials collapse the token stream), then each distinct
    term fans out to its d cells and the 256-cell sketch aggregates
    from vocab×d rows, not occurrences×d. Query shape: terms re-derive
    their d cell coordinates and probe the sketch with a broadcast
    join (the sketch is d×w rows — trivially broadcastable at ANY
    corpus size, which is the entire point of sketching: the reduce
    state is constant-space while exact counting state grows with the
    vocabulary). At 100 TB the CMS replaces the exact-count CTE for
    heavy-hitter screening; here both are computed so the oracle
    checks the estimates against ground truth.
    """
    d = load_table(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .persist()  # both the build and the probe consume it
    )
    coords = cnt.select(
        "token",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _bucket(F.concat_ws("#", F.col("token"), F.lit(str(r))), _CMS_W).alias(
                            "b"
                        ),
                    )
                    for r in range(_CMS_D)
                ]
            )
        ).alias("c"),
    ).select("token", "exact_n", F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    cells = coords.groupBy("r", "b").agg(F.sum("exact_n").alias("cell"))
    return (
        coords.join(F.broadcast(cells), ["r", "b"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell").alias("cms_est"))
        .select(
            "token",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )
