"""Custom Python DataSource (PySpark 4 DataSource API) for the jobs
JSONL fixture — the modern Spark answer to the reference's hand-rolled
JobTracker scraper [R-M]: instead of a driver-side polling loop that
materializes a flat file, the scraper IS a first-class source — schema
declared up front, work split into partitions, rows produced inside
executors, all downstream relational machinery (pushdown of the plan
above, AQE, codegen) applying to its output like any native source.

The reader flattens the nested counters map into typed columns at
ingest (the reference's parse/normalize stage). Partitioning is
round-robin by line number — for a log file standing in for an HTTP
pagination API, each partition maps to an independent page fetch, so
the source parallelizes the way the scraped origin shards.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

JOBS_SCHEMA = (
    "job_id string, user string, framework string, status string, "
    "submit_ts string, duration_ms bigint, map_tasks bigint, reduce_tasks bigint, "
    "hdfs_bytes_read bigint, hdfs_bytes_written bigint, "
    "map_input_records bigint, spilled_records bigint"
)


class JobsLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "hja_jobslog"

    def schema(self) -> str:
        return JOBS_SCHEMA

    def reader(self, schema) -> "JobsLogReader":
        return JobsLogReader(self.options)


class JobsLogReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        self.n_splits = int(options.get("numpartitions", "4"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_splits)]

    def read(self, partition):
        i = partition.value
        with open(self.path) as f:
            for lineno, line in enumerate(f):
                if lineno % self.n_splits != i or not line.strip():
                    continue
                r = json.loads(line)
                c = r["counters"]
                yield (
                    r["job_id"],
                    r["user"],
                    r["framework"],
                    r["status"],
                    r["submit_ts"],
                    r["duration_ms"],
                    r["map_tasks"],
                    r["reduce_tasks"],
                    c["hdfs_bytes_read"],
                    c["hdfs_bytes_written"],
                    c["map_input_records"],
                    c["spilled_records"],
                )
