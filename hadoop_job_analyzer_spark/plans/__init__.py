"""Physical-plan introspection helpers (py4j walks over executed plans).

Used by tests/test_plans.py to turn plan-census claims into executable
row-count guards — e.g. "every `Exchange SinglePartition` in the plan is
metadata-sized" is asserted from the exchange's own shuffle-write metric
after execution, not from plan text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node):
    """Depth-first over a physical plan, descending into adaptive
    query-stage wrappers (whose materialized plan hangs off .plan(),
    not .children())."""
    yield node
    it = node.children().iterator()
    while it.hasNext():
        yield from _walk(it.next())
    if node.getClass().getSimpleName().endswith("QueryStageExec"):
        yield from _walk(node.plan())


def broadcast_exchange_rows(df: DataFrame) -> list[int]:
    """Execute ``df`` (noop sink) and return the row count built into EACH
    broadcast exchange of the final adaptive plan (numOutputRows metric).

    The broadcast twin of the single-partition guard: a broadcast
    relation is collected to the driver and replicated to every
    executor, which is legitimate only for dimension- or metadata-sized
    relations — broadcasting a fact table is the classic driver-OOM /
    network-storm scale killer. ReusedExchange references are skipped
    (their metrics alias the originating exchange's)."""
    df.write.format("noop").mode("overwrite").save()
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        root = root.finalPhysicalPlan()
    rows: list[int] = []
    for node in _walk(root):
        if node.getClass().getSimpleName() != "BroadcastExchangeExec":
            continue
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                rows.append(int(kv._2().value()))
    return rows


def single_partition_exchange_rows(df: DataFrame) -> list[int]:
    """Execute ``df`` (noop sink) and return the record count written into
    EACH single-partition shuffle exchange of the final adaptive plan.

    This is the census guard's measurement: an `Exchange SinglePartition`
    funnels its whole input through one task, which is legitimate only
    when that input is metadata-sized (a final rollup of per-group
    partials, a k-row codebook) — never for row-scale data. The
    exchange's `shuffleRecordsWritten` SQL metric IS that input size.
    """
    df.write.format("noop").mode("overwrite").save()
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        root = root.finalPhysicalPlan()
    rows: list[int] = []
    for node in _walk(root):
        if node.getClass().getSimpleName() != "ShuffleExchangeExec":
            continue
        if not node.outputPartitioning().toString().startswith("SinglePartition"):
            continue
        it = node.metrics().iterator()
        written = 0
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleRecordsWritten":
                written = int(kv._2().value())
        rows.append(written)
    return rows
