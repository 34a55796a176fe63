"""Corpus export sink: sharded, size-bounded JSONL for training readers.

The last stage of a training-data pipeline is not a warehouse table —
it is a directory of shard files a data loader streams: stable shard
membership (resumable jobs re-produce the same layout), bounded file
sizes (a loader schedules files, so file count × size is the
parallelism contract), and a deterministic within-shard order (the
"shuffle" is baked in at write time, readers just stream).

Spark-first shape: ``shard_assign`` (operators/sampling.py) gives the
stable shard id + hash-order position; the write repartitions BY the
shard column so each output directory is produced by exactly the tasks
that own it (without this, every task writes a sliver of every shard =
the small-files explosion), sorts within partitions by position so
file order IS the training order, and bounds records per file with
``maxRecordsPerFile`` (Spark rolls files transparently).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from square_etl_spark.operators.sampling import shard_assign


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API — resolves
    the correct filesystem impl for any supported scheme (file://,
    hdfs://, s3a://), so the manifest step works wherever the writer
    itself can write, not just on the driver's local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    max_records_per_file: int = 100_000,
    compression: str | None = None,
) -> dict[str, object]:
    """Write ``df`` as ``path/shard=K/*.json`` training shards.

    Layout contract:
      - shard membership is md5(key)-stable — re-running on a
        re-partitioned or incrementally-grown corpus keeps every
        existing row in its shard;
      - within a shard, rows land in hash order (``shard_pos``), i.e.
        pre-shuffled for training; the position column is written so
        readers can verify/resume;
      - no file exceeds ``max_records_per_file`` rows; pass
        ``compression='gzip'`` for .json.gz shards.

    One shuffle (the repartition on shard) at any corpus size.  Returns
    a manifest dict {shard -> {files, rows}} and writes it alongside
    the data as ``_manifest.json`` (driver-side metadata, tiny).
    """
    sharded = shard_assign(df, key, n_shards)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)

    # per-shard row counts for the manifest: one tiny aggregate job
    # (shard ids only — no document bodies move), run once per export.
    counts = {
        r["shard"]: r["rows"]
        for r in sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    }
    # enumerate shard dirs via the Hadoop FileSystem API (scheme-aware:
    # local, HDFS, S3A all resolve) and write _manifest.json through the
    # same FS — the sink never assumes driver-local disk.
    fs, root = _hadoop_fs(df.sparkSession, path)
    manifest: dict[str, dict[str, int]] = {}
    for status in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        entry = status.getPath().getName()
        if not (status.isDirectory() and entry.startswith("shard=")):
            continue
        files = [
            f.getPath().getName()
            for f in fs.listStatus(status.getPath())
            if f.getPath().getName().startswith("part-")
        ]
        shard_id = int(entry.split("=", 1)[1])
        manifest[entry] = {"files": len(files), "rows": counts.get(shard_id, 0)}
    out = {"n_shards": n_shards, "max_records_per_file": max_records_per_file,
           "shards": manifest}
    stream = fs.create(
        df.sparkSession._jvm.org.apache.hadoop.fs.Path(root, "_manifest.json"), True
    )
    try:
        stream.write(bytearray(json.dumps(out, indent=2, sort_keys=True), "utf-8"))
    finally:
        stream.close()
    return out
