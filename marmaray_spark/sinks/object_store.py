"""Object-store dispersal sink: staged local write, then per-part upload.

Reference parity: AwsFileSink (M/common/sinks/file/AwsFileSink.java:70-330)
writes part files to a local/HDFS staging dir, then uploads each to S3 via
an AmazonS3 client as ``{objectKey}_{partNum}`` (zero-padded), finally
deleting the staging dir. Credentials/region/bucket come from config.

Spark-first: on a real cluster the idiomatic path is a direct
``df.write.csv("s3a://bucket/key")`` — the committer handles atomic
multi-part upload and there is no driver-side staging at all; this class
exists for the reference's *client-upload* contract (per-object naming,
byte-stream control, non-Hadoop object stores). The upload client is
pluggable and duck-typed; the boto3 client is exercised against moto's
mock S3 in tests (mirroring the reference's mocked-AmazonS3 TestAwsFileSink),
and a local-directory client covers no-AWS runs — the Spark-side plumbing
(staged write, sizing, naming, cleanup) is identical either way.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path
from typing import Protocol

from pyspark.sql import DataFrame

from marmaray_spark.sinks.file import FileSink


class ObjectStoreClient(Protocol):
    """put(local_path, bucket, key) — one finished part file per call."""

    def put(self, local_path: str, bucket: str, key: str) -> None: ...


class LocalDirClient:
    """Filesystem-backed client: bucket = directory (tests / local runs)."""

    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)

    def put(self, local_path: str, bucket: str, key: str) -> None:
        dest = self.root / bucket / key
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copyfile(local_path, dest)


class Boto3Client:
    """S3 client via boto3 when available (AwsFileSink.java:109-135)."""

    def __init__(self, region: str | None = None) -> None:
        try:
            import boto3  # noqa: PLC0415 — optional dependency
        except ImportError as e:
            raise NotImplementedError(
                "boto3 is not installed; use LocalDirClient or a custom "
                "ObjectStoreClient") from e
        self._s3 = boto3.client("s3", region_name=region)

    def put(self, local_path: str, bucket: str, key: str) -> None:
        self._s3.upload_file(local_path, bucket, key)


class ObjectStoreSink:
    """Stage locally with FileSink sizing, upload parts as
    ``{object_key}_{part:05d}[.ext]``, clean the staging dir."""

    def __init__(self, client: ObjectStoreClient, bucket: str, object_key: str,
                 fmt: str = "csv", sep: str = ",", header: bool = True,
                 file_size_mb: float = -1,
                 staging_dir: str | Path | None = None) -> None:
        self.client = client
        self.bucket = bucket
        self.object_key = object_key
        self.fmt = fmt
        self.sep = sep
        self.header = header
        self.file_size_mb = file_size_mb
        self.staging_dir = staging_dir

    def write(self, df: DataFrame) -> list[str]:
        """Write and upload; returns the uploaded object keys in order."""
        staging = Path(self.staging_dir) if self.staging_dir else \
            Path(tempfile.mkdtemp(prefix="objstore_staging_"))
        try:
            FileSink(staging, fmt=self.fmt, sep=self.sep, header=self.header,
                     file_size_mb=self.file_size_mb,
                     file_name_prefix="stage").write(df)
            keys: list[str] = []
            for i, part in enumerate(sorted(staging.glob("stage_*"))):
                ext = part.suffix if part.suffix not in ("", ".crc") else ""
                key = f"{self.object_key}_{i:05d}{ext}"
                self.client.put(str(part), self.bucket, key)
                keys.append(key)
            return keys
        finally:
            shutil.rmtree(staging, ignore_errors=True)  # AwsFileSink deletes staging
