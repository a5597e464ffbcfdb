"""ObjectStoreSink — staged write + per-part upload + staging cleanup
(modeled on T/common/sinks/file/TestAwsFileSink.java, mocked S3)."""

from pathlib import Path

from marmaray_spark.sinks.object_store import LocalDirClient, ObjectStoreSink


def test_upload_single_object(spark, customer, tmp_path):
    store = tmp_path / "store"
    staging = tmp_path / "staging"
    sink = ObjectStoreSink(LocalDirClient(store), "bucket", "exports/customer",
                           staging_dir=staging)
    keys = sink.write(customer)
    assert keys == ["exports/customer_00000.csv"]
    obj = store / "bucket" / keys[0]
    lines = obj.read_text().strip().splitlines()
    assert len(lines) == customer.count() + 1  # header
    assert lines[0].startswith("c_custkey")
    assert not staging.exists()  # staging dir removed after upload


def test_upload_many_parts_sized(spark, customer, tmp_path):
    store = tmp_path / "store"
    sink = ObjectStoreSink(LocalDirClient(store), "b", "k",
                           file_size_mb=0.002, header=False)
    keys = sink.write(customer)
    assert len(keys) > 1
    assert keys == [f"k_{i:05d}.csv" for i in range(len(keys))]
    total = sum(len((store / "b" / k).read_text().strip().splitlines())
                for k in keys)
    assert total == customer.count()


def test_json_format_roundtrip(spark, customer, tmp_path):
    import json

    store = tmp_path / "store"
    sink = ObjectStoreSink(LocalDirClient(store), "b", "j", fmt="json")
    keys = sink.write(customer.select("c_custkey", "c_name"))
    rows = []
    for k in keys:
        for line in (store / "b" / k).read_text().strip().splitlines():
            rows.append(json.loads(line))
    assert len(rows) == customer.count()
    assert {"c_custkey", "c_name"} == set(rows[0])


def test_boto3_client_gated(monkeypatch):
    import builtins

    import pytest

    from marmaray_spark.sinks.object_store import Boto3Client

    real_import = builtins.__import__

    def no_boto3(name, *a, **kw):
        if name == "boto3":
            raise ImportError("nope")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", no_boto3)
    with pytest.raises(NotImplementedError):
        Boto3Client()


def test_boto3_client_uploads_to_mock_s3(spark, tmp_path):
    """The boto3 leg of AwsFileSink parity, exercised against moto's mock
    S3: staged parts upload as {key}_{part:05d}, staging dir removed,
    object bytes round-trip."""
    import pytest

    boto3 = pytest.importorskip("boto3")
    moto = pytest.importorskip("moto")

    from marmaray_spark.sinks.object_store import Boto3Client, ObjectStoreSink

    with moto.mock_aws():
        boto3.client("s3", region_name="us-east-1").create_bucket(Bucket="disp")
        sink = ObjectStoreSink(Boto3Client(region="us-east-1"), "disp",
                               "out/orders", fmt="csv",
                               staging_dir=tmp_path / "stage")
        df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
        keys = sink.write(df.coalesce(1))
        assert keys == ["out/orders_00000.csv"]
        assert not (tmp_path / "stage").exists()

        s3 = boto3.client("s3", region_name="us-east-1")
        listed = [o["Key"] for o in
                  s3.list_objects_v2(Bucket="disp")["Contents"]]
        assert listed == keys
        body = s3.get_object(Bucket="disp",
                             Key=keys[0])["Body"].read().decode()
        lines = body.strip().splitlines()
        assert lines[0] == "k,v" and set(lines[1:]) == {"1,a", "2,b", "3,c"}
