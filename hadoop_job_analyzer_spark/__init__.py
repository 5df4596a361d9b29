"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference project ``willander/hadoop-job-analyzer``,
re-expressed Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

The reference (see SURVEY.md §0.1) is a single-process job-log
metrics aggregator: ingest semi-structured job/event logs → parse/
extract/normalize → filter → project onto dimension sets → grouped
aggregation → rank/top-k → emit. This package generalizes that
pipeline to a distributed, columnar, optimizer-driven engine and adds
the mandated LLM-data-pipeline surface (dedup, similarity search,
multimodal columns, text analysis).

Layout:
    session.py    — canonical SparkSession config (correctness-critical confs)
    catalog.py    — table loading incl. the ns-timestamp recipe
    registry.py   — single source of truth for queries()/oracle_sql()
    operators/    — scans, filters, joins, aggs, windows, sorts, setops, udfs,
                    llm (dedup/similarity/text/multimodal-join),
                    textops (lang-id/quality/tokens/fingerprint),
                    neardup (simhash/jaccard/embedding-dup/IVF ANN),
                    multimodal (binary media plumbing, stub codecs)
    functions/    — scalar function families
    streaming/    — Structured Streaming keys (availableNow + memory sink)
    sources/      — fixture writers (csv/jsonl twins)
"""

__version__ = "0.1.0"
