"""Global docID assignment: dense int64 ids in url order, cluster-scalable.

Reference parity: PageIndex's positional docID is the page's 1-based
``physical_index`` (``/root/reference/pageindex/utils.py:417-440`` list
position; tag parse ``utils.py:520-540``). Here the docID must be global,
dense, and ordered the same way the tie-break orders urls (score desc, url
asc), so that docID order == url order and WAND's docID tie-break equals the
oracle's url tie-break.

Scalable two-pass scheme (no zipWithIndex over a driver-collected list):
1. ``repartitionByRange(P, url)`` + ``sortWithinPartitions(url)`` — range
   shuffle keyed by url (Spark samples range bounds; at 10^12 docs P is
   O(data / target-partition-size)).
2. count rows per partition (cheap scan), cumsum on the driver (P integers
   only), broadcast offsets, ``mapInArrow`` adds
   ``doc_id = offset + local row index``.

The resulting frame is range-partitioned by url AND by doc_id simultaneously
(same order), which downstream stages exploit: SPIMI segments inherit
disjoint docID ranges per partition for free, and segment merge becomes an
ordered concatenation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def assign_doc_ids(
    docs: DataFrame, num_partitions: int | None = None
) -> tuple[DataFrame, list[int]]:
    """Add dense int64 ``doc_id`` + int32 ``part_id`` columns, url-ordered.

    Output keeps each input column; each output partition owns a contiguous
    docID range and rows are sorted by (url == doc_id) within it. Returns
    (df, offsets) where offsets[p] is partition p's first docID — the docID
    grid used by norms packing and query-time cell assignment.
    """
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = docs.repartitionByRange(num_partitions, "url").sortWithinPartitions("url")

    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    sizes = {r["pid"]: r["count"] for r in counts}
    offsets: list[int] = []
    acc = 0
    for pid in range(num_partitions):
        offsets.append(acc)
        acc += sizes.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)

    out_type = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("part_id", IntegerType(), False),
        ]
        + list(ranged.schema.fields)
    )

    def add_ids(iterator: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        next_id = bc.value[pid]
        for batch in iterator:
            n = batch.num_rows
            ids = pa.array(range(next_id, next_id + n), pa.int64())
            pids = pa.array([pid] * n, pa.int32())
            next_id += n
            yield pa.RecordBatch.from_arrays(
                [ids, pids] + batch.columns,
                names=["doc_id", "part_id"] + batch.schema.names,
            )

    return ranged.mapInArrow(add_ids, schema=out_type), offsets
