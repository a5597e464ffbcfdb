"""Checkpoint/metadata managers and partition high-watermark planners."""

from marmaray_spark.metadata.manager import (
    FileSystemMetadataManager,
    InMemoryMetadataManager,
    MetadataManager,
    MultiMetadataManager,
    TableBackedMetadataManager,
)
from marmaray_spark.metadata.partition import (
    DatePartitionManager,
    PartitionManager,
)

__all__ = [
    "MetadataManager",
    "InMemoryMetadataManager",
    "FileSystemMetadataManager",
    "TableBackedMetadataManager",
    "MultiMetadataManager",
    "PartitionManager",
    "DatePartitionManager",
]
