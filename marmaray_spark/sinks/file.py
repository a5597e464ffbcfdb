"""File sink: CSV/JSON output with size-targeted file counts.

Reference parity: FileSink (M/common/sinks/file/FileSink.java:58-281)
estimates dataset size by sampling <=100 rows and extrapolating
(:209-250), repartitions to ceil(totalMB / file_size_mb) files (-1 =>
single file), optionally injects a CSV header per file (:189-196);
HdfsFileSink OVERWRITE deletes the destination first and renames
``part-*`` files to ``{prefix}_{05d}`` sequential names
(M/common/sinks/file/HdfsFileSink.java:44-113).

Spark-first: the size estimate is a real aggregate —
``avg(octet_length(to_csv(...)))`` over a bounded sample — cheaper and
more accurate than driver-side sampling; the header is Spark's native
``option("header")``; rename happens post-write via the local/Hadoop FS.
At 100 TB the same estimate-then-repartition plan holds because the
sample is fraction-bounded, and AQE coalescing keeps the write tasks
balanced.
"""

from __future__ import annotations

import math
import shutil
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROW_SAMPLING_COUNT = 100  # FileSink.java:59


def estimate_size_mb(df: DataFrame, sample_rows: int = ROW_SAMPLING_COUNT) -> float:
    """Sampled average encoded-row size x total count, in MB."""
    total = df.count()
    if total == 0:
        return 0.0
    fraction = min(1.0, (sample_rows * 4) / total)
    sample = df.sample(fraction=fraction, seed=42).limit(sample_rows)
    avg_len = (sample
               .select(F.octet_length(F.to_csv(F.struct(*df.columns))).alias("len"))
               .agg(F.avg("len").alias("avg"))
               .collect()[0]["avg"]) or 0.0
    return total * float(avg_len) / (1024 * 1024)


def plan_num_files(size_mb: float, file_size_mb: float) -> int:
    """-1 => single file; else ceil(total/target), >=1 (FileSink.java:209-221)."""
    if file_size_mb <= 0:
        return 1
    n = size_mb / file_size_mb
    if not math.isfinite(n):
        raise ValueError(
            f"file_size_mb={file_size_mb!r} is too small for dataset of "
            f"{size_mb} MB (file count overflows)")
    return max(1, math.ceil(n))


class FileSink:
    """Writes a DataFrame as CSV or JSON lines with target file sizing."""

    def __init__(self, path: str | Path, fmt: str = "csv", sep: str = ",",
                 header: bool = True, file_size_mb: float = -1,
                 mode: str = "overwrite", file_name_prefix: str | None = None,
                 compression: str | None = None) -> None:
        if fmt not in ("csv", "json"):
            raise ValueError(f"unsupported file sink format {fmt!r}")
        # lz4 = the reference's sequence-file codec (FileSink.java LZ4
        # saveAsNewAPIHadoopFile); gzip/snappy/zstd equally valid here.
        if compression not in (None, "none", "lz4", "gzip", "snappy", "zstd", "bzip2"):
            raise ValueError(f"unsupported compression {compression!r}")
        self.path = Path(path)
        self.fmt = fmt
        self.sep = sep
        self.header = header
        self.file_size_mb = file_size_mb
        self.mode = mode
        self.file_name_prefix = file_name_prefix
        self.compression = compression

    def write(self, df: DataFrame) -> int:
        """Write; returns the number of data files produced."""
        n_files = plan_num_files(estimate_size_mb(df), self.file_size_mb)
        out = df.coalesce(n_files) if n_files < df.rdd.getNumPartitions() \
            else df.repartition(n_files)
        if self.mode == "overwrite" and self.path.exists():
            shutil.rmtree(self.path)  # HdfsFileSink.java:61-77 deletes dest first
        writer = out.write.mode(self.mode)
        if self.compression:
            writer = writer.option("compression", self.compression)
        if self.fmt == "csv":
            writer.option("sep", self.sep).option("header", str(self.header).lower()) \
                  .option("quote", '"').option("escape", '"').csv(str(self.path))
        else:
            writer.json(str(self.path))
        return self._rename_parts() if self.file_name_prefix else \
            len(list(self.path.glob("part-*")))

    def _rename_parts(self) -> int:
        """part-* -> {prefix}_{05d} sequential names (HdfsFileSink.java:78-113)."""
        parts = sorted(self.path.glob("part-*"))
        for i, p in enumerate(parts):
            suffix = "".join(p.suffixes[-1:]) if p.suffix != "" else ""
            p.rename(self.path / f"{self.file_name_prefix}_{i:05d}{suffix}")
        return len(parts)


class VersionedFileSink:
    """VERSION dispersal (FileSinkConfiguration.DispersalType.VERSION,
    the reference's DEFAULT): every run lands in its own
    ``<path>/<version>/`` directory — consumers keep reading the old
    version until the new one is complete, and ``retain_versions`` old
    runs stay available for rollback (the retain-N idea the metadata
    manager uses, applied to dispersal output). OVERWRITE dispersal is
    ``FileSink(mode="overwrite")``.
    """

    def __init__(self, path: str | Path, retain_versions: int | None = None,
                 **filesink_kwargs) -> None:
        if retain_versions is not None and retain_versions < 1:
            raise ValueError("retain_versions must be >= 1")
        self.path = Path(path)
        self.retain_versions = retain_versions
        self.kwargs = filesink_kwargs

    def versions(self) -> list[str]:
        if not self.path.exists():
            return []
        return sorted(p.name for p in self.path.iterdir()
                      if p.is_dir() and p.name.isdigit())

    def latest_path(self) -> Path | None:
        vs = self.versions()
        return self.path / vs[-1] if vs else None

    def write(self, df: DataFrame, version: str | None = None) -> str:
        """Write a new version (12-digit id, monotonic — next sequential
        when not supplied); prune beyond ``retain_versions``. Returns the
        version id."""
        if version is None:
            vs = self.versions()
            version = f"{(int(vs[-1]) + 1) if vs else 0:012d}"
        elif not (len(version) == 12 and version.isdigit()):
            raise ValueError(f"version must be 12 digits, got {version!r}")
        if version in self.versions():
            raise FileExistsError(f"version {version} already dispersed")
        FileSink(self.path / version, mode="error", **self.kwargs).write(df)
        if self.retain_versions is not None:
            for old in self.versions()[:-self.retain_versions]:
                shutil.rmtree(self.path / old, ignore_errors=True)
        return version


class SequenceFileSink:
    """Hadoop SequenceFile (Text key / Text value) output with optional
    LZ4 block compression — FileSink.java:134-165 sequence branch, the
    reference's only non-text output format.

    The ONE deliberate RDD hop in this engine: SequenceFileOutputFormat
    is a key/value Hadoop OutputFormat with no DataFrame writer, and the
    reference path is an RDD pair write too. Everything up to the final
    hop stays DataFrame: the caller provides (or we derive via
    converters.encode_json_lines / encode_csv_lines) a two-column
    (key, line) frame, sizing reuses the same estimate-then-repartition
    plan as FileSink, and the pair conversion is a zero-copy projection.
    Read back with ``spark.sparkContext.sequenceFile(path)``.
    """

    SUPPORTED_CODECS = {"lz4": "org.apache.hadoop.io.compress.Lz4Codec"}
    # FileSink.java:143-157: lz4 or uncompressed; anything else raises

    def __init__(self, path: str | Path, key_col: str = "key",
                 value_col: str = "line", file_size_mb: float = -1,
                 compression: str | None = "lz4") -> None:
        if compression is not None and compression not in self.SUPPORTED_CODECS:
            raise ValueError(
                f"Compression codec {compression!r} not supported")  # :152-155
        self.path = Path(path)
        self.key_col = key_col
        self.value_col = value_col
        self.file_size_mb = file_size_mb
        self.compression = compression

    def write(self, df: DataFrame) -> int:
        """Write (key, value) rows; returns the number of data files."""
        pairs = df.select(F.col(self.key_col).cast("string"),
                          F.col(self.value_col).cast("string"))
        n_files = plan_num_files(estimate_size_mb(pairs), self.file_size_mb)
        if self.path.exists():
            shutil.rmtree(self.path)   # overwrite semantics, like HdfsFileSink
        conf = {}
        if self.compression:
            conf = {"mapreduce.output.fileoutputformat.compress": "true",
                    "mapreduce.output.fileoutputformat.compress.codec":
                        self.SUPPORTED_CODECS[self.compression]}
        (pairs.rdd.map(tuple).repartition(n_files)
         .saveAsNewAPIHadoopFile(
             str(self.path),
             "org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat",
             keyClass="org.apache.hadoop.io.Text",
             valueClass="org.apache.hadoop.io.Text",
             conf=conf))
        return len(list(self.path.glob("part-*")))

    def read(self, spark) -> DataFrame:
        """Read back as a (key, line) DataFrame."""
        return spark.sparkContext.sequenceFile(str(self.path)) \
            .toDF([self.key_col, self.value_col])
