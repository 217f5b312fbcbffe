"""Data-layout writers: the storage-side half of 100 TB query speed.

Predicate pushdown (PLANS.md) only pays off if the files are laid out so
pruning can skip I/O. Two layouts:

* ``write_partitioned`` — hive-style directory partitioning on a
  low-cardinality column; equality/IN predicates on it become
  ``PartitionFilters`` and skip whole directories before any file is
  opened.
* ``write_clustered`` — range-repartition + sort-within-partitions on a
  (possibly high-cardinality) sort key; each parquet file then covers a
  narrow, near-disjoint min/max range, so range predicates prune at the
  file/row-group level via footer statistics.

The reference has no storage layout at all (it reads whatever it is
handed, SRC/utils/IO.scala:37-49); these are extension operators for the
training-data-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Hive-partitioned write. Keep ``partition_cols`` low-cardinality
    (lang, date, source bucket): each distinct tuple becomes a directory,
    and small-file explosion at high cardinality is the classic failure
    mode. At 100 TB, partition on the columns every query filters by."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    getattr(writer, fmt)(path)


def write_clustered(df: DataFrame, path: str, sort_cols: list[str],
                    num_files: int | None = None,
                    mode: str = "overwrite") -> None:
    """Range-clustered write: globally range-partition on ``sort_cols``
    (sampled range boundaries — one shuffle), then sort within each
    partition so every output file covers a tight key range. Range scans
    then read only the files whose footer [min,max] intersects the
    predicate — the poor man's clustered index, and the layout that makes
    `l_shipdate BETWEEN …` queries cheap at 100 TB."""
    out = (df.repartitionByRange(num_files, *sort_cols) if num_files
           else df.repartitionByRange(*sort_cols))
    out.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)
