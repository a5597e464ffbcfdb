"""Sources: parquet/Hive-partition, JSON/CSV files, Kafka-style offset streams."""
