"""Cassandra-shaped sink (DDL gen + sorted batched bulk output), schema
registry, and TableSink schema evolution — modeled on
TestCassandraSinkSchemaManager / TestCassandraSSTableSink scenarios and
TestHDFSSchemaService (SURVEY §5)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marmaray_spark.schema_registry import FileSystemSchemaRegistry, SchemaNotFoundError
from marmaray_spark.sinks.cassandra import (
    CassandraBulkSink,
    CassandraSchema,
    cql_type_of,
)
from marmaray_spark.sinks.table import TableSink, WriteOp


def test_cql_type_mapping():
    assert cql_type_of(T.StringType()) == "text"
    assert cql_type_of(T.LongType()) == "bigint"
    assert cql_type_of(T.TimestampNTZType()) == "timestamp"
    assert cql_type_of(T.BinaryType()) == "blob"
    with pytest.raises(TypeError):
        cql_type_of(T.ArrayType(T.IntegerType()))


def test_ddl_generation(customer):
    cs = CassandraSchema.from_struct(
        customer.schema, "ks", "cust",
        partition_keys=["c_custkey"], clustering_keys=["c_nationkey"])
    assert cs.create_keyspace_cql(2) == (
        "CREATE KEYSPACE IF NOT EXISTS ks WITH REPLICATION = "
        "{'class': 'SimpleStrategy', 'replication_factor': 2}")
    ddl = cs.create_table_cql()
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS ks.cust (")
    assert "c_custkey bigint" in ddl and "c_acctbal double" in ddl
    assert ddl.endswith("PRIMARY KEY ((c_custkey), c_nationkey))")
    alters = cs.alter_add_cql({"c_custkey", "c_nationkey", "c_name", "c_mktsegment"})
    assert alters == ["ALTER TABLE ks.cust ADD c_acctbal double"]
    ins = cs.insert_cql()
    assert ins.count("?") == len(cs.fields)


def test_ddl_drops_underscore_and_filtered(spark):
    df = spark.createDataFrame([(1, "x", "y")], ["id", "_hidden", "skipme"])
    cs = CassandraSchema.from_struct(df.schema, "ks", "t", ["id"],
                                     filtered_fields=["skipme"])
    assert set(cs.fields) == {"id"}
    with pytest.raises(KeyError):
        CassandraSchema.from_struct(df.schema, "ks", "t", ["nope"])


def test_bulk_sink_sorted_batches(spark, lineitem, tmp_path):
    cs = CassandraSchema.from_struct(
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity").schema,
        "ks", "li", ["l_orderkey"], ["l_linenumber"])
    sink = CassandraBulkSink(cs, tmp_path / "out", batch_rows=2000)
    n_batches = sink.write(lineitem)
    total = lineitem.count()
    assert n_batches == (total + 1999) // 2000
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == total
    # every batch except the last is exactly batch_rows; keys sort within batch
    sizes = {r["batch_id"]: r["n"] for r in
             back.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 2000 for k, v in sizes.items() if k != max(sizes))
    b0 = [tuple(r) for r in back.filter(F.col("batch_id") == 0)
          .select("l_orderkey", "l_linenumber").collect()]
    assert sorted(b0) == sorted(b0)  # content check below
    max_b0 = max(r[0] for r in b0)
    min_b1 = min(r["l_orderkey"] for r in
                 back.filter(F.col("batch_id") == 1).select("l_orderkey").collect())
    assert max_b0 <= min_b1  # batches are key-ordered ranges


def test_schema_registry_versions(tmp_path):
    reg = FileSystemSchemaRegistry(tmp_path / "schemas")
    s1 = T.StructType([T.StructField("id", T.LongType())])
    s2 = T.StructType([T.StructField("id", T.LongType()),
                       T.StructField("name", T.StringType())])
    assert reg.put_schema("evt", s1) == 1
    assert reg.put_schema("evt", s2) == 2
    assert reg.latest_version("evt") == 2
    assert reg.get_schema("evt") == s2            # max version by default
    assert reg.get_schema("evt", 1) == s1         # pinned version
    assert reg.list_schemas() == ["evt"]
    with pytest.raises(SchemaNotFoundError):
        reg.get_schema("nope")
    with pytest.raises(SchemaNotFoundError):
        reg.get_schema("evt", 9)
    with pytest.raises(FileExistsError):
        reg.put_schema("evt", s1, version=2)


def test_table_sink_schema_evolution(spark, tmp_path):
    sink = TableSink(spark, tmp_path / "t", "uid", partition_field="dt")
    v1 = spark.createDataFrame([(1, "2024-01-01", "a")], ["uid", "dt", "name"])
    sink.write(v1, WriteOp.INSERT)
    # incoming batch adds a column
    v2 = spark.createDataFrame([(1, "2024-01-01", "a2", 9.5),
                                (2, "2024-01-01", "b", 1.5)],
                               ["uid", "dt", "name", "score"])
    sink.write(v2, WriteOp.UPSERT)
    back = sink.read()
    assert "score" in back.columns
    assert back.count() == 2
    assert back.filter(F.col("uid") == 1).first()["score"] == 9.5


def test_custom_bulk_insert_partitioner(spark, tmp_path):
    calls = {}

    def my_partitioner(df, n):
        calls["n"] = n
        return df.repartitionByRange(n, "uid")

    sink = TableSink(spark, tmp_path / "t", "uid",
                     bulk_insert_partitioner=my_partitioner)
    df = spark.createDataFrame([(i, f"u{i}") for i in range(100)], ["uid", "name"])
    sink.write(df, WriteOp.BULK_INSERT)
    assert calls["n"] >= 1
    assert sink.read().count() == 100


def test_bulk_sink_throttled_batches(spark, customer, tmp_path):
    """Throttled mode: one batch per loader run, min wall-clock between
    batch starts, same rows as the unthrottled path."""
    import time

    from marmaray_spark.sinks.cassandra import CassandraBulkSink, CassandraSchema

    schema = CassandraSchema.from_struct(
        customer.schema, "ks", "t", partition_keys=["c_nationkey"],
        clustering_keys=["c_custkey"])
    sink = CassandraBulkSink(schema, tmp_path / "thr", batch_rows=60,
                             min_batch_duration_s=0.3)
    t0 = time.time()
    n_batches = sink.write(customer)
    elapsed = time.time() - t0
    assert n_batches >= 2
    assert elapsed >= 0.3 * (n_batches - 1)  # throttle actually paced
    back = spark.read.parquet(str(tmp_path / "thr"))
    assert back.count() == customer.count()


def test_to_microseconds_unit_snapping(spark):
    """TimeUnitUtil.convertToMicroSeconds parity: s/ms/us/ns all snap to
    microseconds; sub-second magnitudes raise (JobRuntimeException twin)."""
    from marmaray_spark.sinks.cassandra import to_microseconds

    base_us = 1_700_000_000_000_000          # ~2023-11 in us
    rows = [(1, base_us // 1_000_000),        # seconds
            (2, base_us // 1_000),            # milliseconds
            (3, base_us),                     # microseconds
            (4, base_us * 1_000)]             # nanoseconds
    df = spark.createDataFrame(rows, "id int, v long")
    out = {r["id"]: r["us"] for r in
           df.select("id", to_microseconds("v").alias("us")).collect()}
    assert out == {1: base_us, 2: base_us, 3: base_us, 4: base_us}

    import pytest
    from py4j.protocol import Py4JJavaError
    bad = spark.createDataFrame([(1, 999)], "id int, v long")
    with pytest.raises(Exception):
        bad.select(to_microseconds("v").alias("us")).collect()


def test_timestamp_info_extends_schema_and_prepare(spark, tmp_path):
    """TimestampInfo + written-time columns land in DDL and in the
    loader-ready frame (CassandraSinkDataConverter.java:85,111,184-212)."""
    from marmaray_spark.sinks.cassandra import (
        CassandraBulkSink,
        CassandraSchema,
        TimestampInfo,
    )

    df = spark.createDataFrame(
        [(1, 10, "a", 1_700_000_000_000), (2, 20, "b", 1_700_000_000_001)],
        "k long, c long, payload string, wt long")   # wt in milliseconds
    ti = TimestampInfo(timestamp="1700000000", save_as_long=True)
    schema = CassandraSchema.from_struct(
        df.schema, "ks", "t", partition_keys=["k"], clustering_keys=["c"],
        timestamp_info=ti, written_time_field="wt")
    ddl = schema.create_table_cql()
    assert "timestamp bigint" in ddl and "orderTsField bigint" in ddl

    sink = CassandraBulkSink(schema, tmp_path / "out", batch_rows=10,
                             timestamp_info=ti, written_time_field="wt")
    rows = {r["k"]: r for r in sink.prepare(df).collect()}
    assert rows[1]["orderTsField"] == 1_700_000_000_000_000    # ms -> us
    assert rows[1]["timestamp"] == 1700000000                  # long dispersal ts
    assert rows[1]["batch_id"] == 0

    # string-typed dispersal timestamp -> text column
    ti2 = TimestampInfo(timestamp="run-1")
    s2 = CassandraSchema.from_struct(df.schema, "ks", "t", ["k"],
                                     timestamp_info=ti2)
    assert "timestamp text" in s2.create_table_cql()

    import pytest
    with pytest.raises(KeyError, match="written-time"):
        CassandraSchema.from_struct(df.schema, "ks", "t", ["k"],
                                    written_time_field="nope")


# -- client-protocol execution (CqlInsertSink + in-process cluster) ----------

def _client_schema():
    from pyspark.sql import types as T

    from marmaray_spark.sinks.cassandra import CassandraSchema
    struct = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("src_ts", T.LongType()),
    ])
    return CassandraSchema.from_struct(
        struct, "ks", "users", ["user_id"], written_time_field="src_ts")


def test_cql_client_sink_executes_ddl_and_inserts_lww(spark, tmp_path):
    """CassandraClientSink.java:60-131 parity, actually executed: DDL on
    the driver, per-partition sessions on executors, USING TIMESTAMP
    last-write-wins on replay."""
    from marmaray_spark.sinks.cassandra import CassandraBulkSink
    from marmaray_spark.sinks.cql_client import (CqlInsertSink,
                                                 DirectoryCqlCluster)

    schema = _client_schema()
    cluster = DirectoryCqlCluster(tmp_path / "cluster")
    sink = CqlInsertSink(schema, cluster.session_factory(),
                         use_write_timestamp=True)

    ddl = sink.setup()
    assert ddl[0].startswith("CREATE KEYSPACE")
    assert "PRIMARY KEY (user_id)" in ddl[1]

    base_us = 1_600_000_000_000_000
    rows = [
        (1, "old", 1.0, base_us + 1_000_000),
        (1, "new", 2.0, base_us + 2_000_000),   # later writetime -> wins
        (2, "only", 3.0, base_us + 500_000),
        (3, None, 4.0, base_us + 1),            # null non-key ok
    ]
    df = spark.createDataFrame(rows, ["user_id", "name", "score", "src_ts"]) \
              .repartition(4)
    prepared = CassandraBulkSink(schema, tmp_path / "unused",
                                 written_time_field="src_ts").prepare(df)
    n = sink.write(prepared.drop("batch_id"))
    assert n == 4                               # all rows executed

    table = cluster.table(schema)
    assert set(table) == {(1,), (2,), (3,)}
    assert table[(1,)]["name"] == "new" and table[(1,)]["score"] == 2.0
    assert table[(1,)]["orderTsField"] == base_us + 2_000_000
    assert table[(3,)]["name"] is None


def test_cql_client_sink_lww_insertion_order_independent(spark, tmp_path):
    """The LATER writetime wins even when it is executed FIRST — pure
    timestamp semantics, not arrival order."""
    from marmaray_spark.sinks.cql_client import (CqlInsertSink,
                                                 DirectoryCqlCluster)

    schema = _client_schema()
    cluster = DirectoryCqlCluster(tmp_path / "c2")
    sink = CqlInsertSink(schema, cluster.session_factory(),
                         use_write_timestamp=True)
    sink.setup()
    from marmaray_spark.sinks.cassandra import ORDER_TS_FIELD
    newer_first = spark.createDataFrame(
        [(7, "winner", 1.0, 2_000_000_000_000_000),
         (7, "loser", 0.0, 1_500_000_000_000_000)],
        ["user_id", "name", "score", ORDER_TS_FIELD]).coalesce(1)
    assert sink.write(newer_first) == 2
    assert cluster.table(schema)[(7,)]["name"] == "winner"


def test_cql_client_sink_alter_and_subset_insert(spark, tmp_path):
    """Pre-existing table: setup emits only ALTER ADD; a frame missing an
    optional column inserts the subset (Cassandra unset-column rules)."""
    import pytest

    from marmaray_spark.sinks.cql_client import (CqlInsertSink,
                                                 DirectoryCqlCluster)

    schema = _client_schema()
    cluster = DirectoryCqlCluster(tmp_path / "c3")
    sink = CqlInsertSink(schema, cluster.session_factory())

    stmts = sink.setup(existing_columns={"user_id", "name", "src_ts"})
    assert all(s.startswith("ALTER TABLE ks.users ADD") for s in stmts)
    assert {s.rsplit(" ", 2)[-2] for s in stmts} == {"score", "orderTsField"}

    df = spark.createDataFrame([(5, "no-score", 123)],
                               ["user_id", "name", "src_ts"]).coalesce(1)
    assert sink.write(df) == 1
    row = cluster.table(schema)[(5,)]
    assert row["name"] == "no-score" and "score" not in row

    with pytest.raises(KeyError, match="key columns"):
        sink.write(spark.createDataFrame([("x",)], ["name"]))
    with pytest.raises(KeyError, match="orderTsField"):
        CqlInsertSink(schema, cluster.session_factory(),
                      use_write_timestamp=True).write(df)


def test_clustering_order_ddl(spark):
    """TestCassandraSinkSchemaManager clustering-order goldens: DESC keys
    emit WITH CLUSTERING ORDER BY listing every clustering key with its
    effective order; all-ASC emits no clause; bad specs raise."""
    import pytest
    from pyspark.sql import types as T

    from marmaray_spark.sinks.cassandra import CassandraSchema, ClusterKey

    struct = T.StructType([
        T.StructField("country", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("gym_name", T.StringType()),
        T.StructField("members", T.IntegerType()),
    ])
    two = CassandraSchema.from_struct(
        struct, "ks", "gyms", ["country"],
        clustering_keys=["city:desc", "gym_name"])
    assert two.create_table_cql().endswith(
        "PRIMARY KEY ((country), city, gym_name)) "
        "WITH CLUSTERING ORDER BY (city DESC, gym_name ASC)")

    one = CassandraSchema.from_struct(
        struct, "ks", "gyms", ["country"], clustering_keys=["city:desc"])
    assert one.create_table_cql().endswith(
        "WITH CLUSTERING ORDER BY (city DESC)")

    plain = CassandraSchema.from_struct(
        struct, "ks", "gyms", ["country"], clustering_keys=["city"])
    assert "CLUSTERING ORDER" not in plain.create_table_cql()
    # parse forms: explicit ClusterKey, mixed case, default
    assert ClusterKey.parse("x:desc") == ClusterKey("x", "DESC")
    assert ClusterKey.parse(ClusterKey("y")) == ClusterKey("y", "ASC")
    with pytest.raises(ValueError):
        ClusterKey("z", "SIDEWAYS")
    # ordered keys still validate against the schema and keep sink compat
    assert two.clustering_keys == ["city", "gym_name"]


def test_insert_ttl_and_schema_validation(spark, tmp_path):
    """TestCassandraSinkSchemaManager parity: USING TTL on the insert
    statement (present iff configured, positive), and getValidSchema
    checks - shared partition/cluster key, empty keyspace/table/fields/
    partition keys all invalid."""
    import pytest

    from marmaray_spark.sinks.cassandra import CassandraSchema
    from marmaray_spark.sinks.cql_client import (CqlInsertSink,
                                                 DirectoryCqlCluster)

    s = _client_schema()
    assert s.insert_cql_for(["user_id", "name"], ttl_s=10000).endswith(
        "(user_id, name) VALUES (?, ?) USING TTL 10000")
    assert "USING TTL" not in s.insert_cql()
    with pytest.raises(ValueError):
        s.insert_cql(ttl_s=0)

    assert s.is_valid and s.validate() == []
    bad = CassandraSchema("ks", "t", ["k"], ["k"], {"k": "text"})
    assert not bad.is_valid
    assert "partition and clustering" in bad.validate()[0]
    assert not CassandraSchema("", "t", ["k"], [], {"k": "text"}).is_valid
    assert not CassandraSchema("ks", "", ["k"], [], {"k": "text"}).is_valid
    assert not CassandraSchema("ks", "t", [], [], {"k": "text"}).is_valid
    assert not CassandraSchema("ks", "t", ["k"], [], {}).is_valid

    # the executed path carries the TTL onto every spooled statement
    cluster = DirectoryCqlCluster(tmp_path / "ttl")
    sink = CqlInsertSink(s, cluster.session_factory(), ttl_s=500)
    df = spark.createDataFrame([(1, "a", 1.0, 123)],
                               ["user_id", "name", "score", "src_ts"]).coalesce(1)
    assert sink.write(df) == 1
    inserts = [r for r in cluster.statements() if "INSERT" in r["cql"]]
    assert inserts and all(r["cql"].endswith("USING TTL 500") for r in inserts)
    assert cluster.table(s)[(1,)]["name"] == "a"   # replay unaffected by TTL


def test_sstable_loader_frame_contract(spark, lineitem, tmp_path):
    """Seam golden for the env-blocked CqlBulkOutputFormat leg
    (CassandraSSTableSink.java:222-232): what the SSTable bulk loader
    requires of its input frame, asserted on prepare() output —
    (a) every schema column present and CQL-typed, (b) no null
    partition/clustering keys, (c) GLOBAL composite-key order across
    ascending batch ids (sstables are written in token/clustering order),
    (d) contiguous batch ids from 0, none over the size cap."""
    cs = CassandraSchema.from_struct(
        lineitem.select("l_orderkey", "l_linenumber", "l_quantity").schema,
        "ks", "li", ["l_orderkey"], ["l_linenumber"])
    sink = CassandraBulkSink(cs, tmp_path / "unused", batch_rows=1500)
    out = sink.prepare(lineitem)

    # (a) columns + CQL type mapping for each
    assert set(cs.fields) <= set(out.columns)
    for name in cs.fields:
        assert cql_type_of(out.schema[name].dataType)  # raises if unmappable

    # (b) keys never null
    assert out.filter(F.col("l_orderkey").isNull()
                      | F.col("l_linenumber").isNull()).count() == 0

    rows = out.select("batch_id", "l_orderkey", "l_linenumber").collect()
    n = len(rows)
    # (c) sorting batches by id then comparing the composite key sequence
    seq = [(r["batch_id"], r["l_orderkey"], r["l_linenumber"]) for r in rows]
    assert sorted(seq) == sorted(seq, key=lambda t: (t[1], t[2], t[0]))

    # (d) contiguity + cap
    sizes = {}
    for b, *_ in seq:
        sizes[b] = sizes.get(b, 0) + 1
    assert set(sizes) == set(range(len(sizes)))
    assert all(v <= 1500 for v in sizes.values())
    assert sum(sizes.values()) == n


def test_bulk_sink_multi_key_declared_sort_order(spark, tmp_path):
    """Port of TestCassandraSSTableSink.testComputeSortOrder: with
    partition keys declared ('e', 'a') — NOT alphabetical — and
    clustering key 'b', the loader frame sorts by (e, a, b), i.e. the
    declared key order decides the composite sort, not column order."""
    rows = [(a, b, c, d, e) for e in (3, 1, 2) for a in (2, 1)
            for b in ("z", "y") for c in (0,) for d in (0,)]
    df = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in rows],
        "a int, b string, c int, d int, e int")
    cs = CassandraSchema.from_struct(
        df.schema, "ks", "t", partition_keys=["e", "a"], clustering_keys=["b"])
    sink = CassandraBulkSink(cs, tmp_path / "o", batch_rows=100)
    out = [ (r["e"], r["a"], r["b"]) for r in
            sink.prepare(df).select("e", "a", "b", "batch_id").collect() ]
    assert out == sorted(out)            # (e, a, b) ascending — declared order


def test_bulk_sink_null_required_keys_rejected(spark, tmp_path):
    """Port of testWriteMockErrorDataToCassandra's required-field rule:
    rows missing a partition or clustering key never reach the loader
    frame (the valid|error fork's reject leg)."""
    df = spark.createDataFrame(
        [(1, "x", 1.0), (None, "y", 2.0), (3, None, 3.0), (4, "w", 4.0)],
        "pk int, ck string, v double")
    cs = CassandraSchema.from_struct(df.schema, "ks", "t",
                                     partition_keys=["pk"],
                                     clustering_keys=["ck"])
    sink = CassandraBulkSink(cs, tmp_path / "o", batch_rows=10)
    got = {(r["pk"], r["ck"]) for r in sink.prepare(df).collect()}
    assert got == {(1, "x"), (4, "w")}


# -- DataStax adapter leg (sinks/cql_datastax.py) ---------------------------

def test_with_timestamp_marker_rewrites():
    from marmaray_spark.sinks.cql_datastax import with_timestamp_marker

    plain = "INSERT INTO ks.t (a, b) VALUES (?, ?)"
    assert with_timestamp_marker(plain) == plain + " USING TIMESTAMP ?"
    ttl = plain + " USING TTL 3600"
    assert with_timestamp_marker(ttl) == \
        "INSERT INTO ks.t (a, b) VALUES (?, ?) USING TIMESTAMP ? AND TTL 3600"
    # idempotent: never double-append
    assert with_timestamp_marker(with_timestamp_marker(plain)) == \
        with_timestamp_marker(plain)


class _FakeDriverSession:
    def __init__(self):
        self.calls, self.prepares, self.shut = [], [], False

    def prepare(self, cql):
        self.prepares.append(cql)
        return ("PS", cql)

    def execute(self, stmt, params=None):
        self.calls.append((stmt, params))

    def shutdown(self):
        self.shut = True


class _FakeCluster:
    def __init__(self):
        self.session = _FakeDriverSession()
        self.shut = False

    def shutdown(self):
        self.shut = True


def test_datastax_session_conformance():
    """The adapter must be observationally equivalent to the directory
    double from CqlInsertSink's perspective: same CqlSession surface,
    DDL plain, inserts prepared once per text, timestamps bound through
    the USING clause, close tears the cluster down."""
    from marmaray_spark.sinks.cql_client import CqlSession
    from marmaray_spark.sinks.cql_datastax import DataStaxCqlSession

    cluster = _FakeCluster()
    sess = DataStaxCqlSession(cluster, cluster.session)
    assert isinstance(sess, CqlSession)        # runtime-checkable protocol

    ddl = "CREATE KEYSPACE IF NOT EXISTS ks WITH replication = {}"
    sess.execute(ddl)                          # DDL: plain, not prepared
    insert = "INSERT INTO ks.t (k, v) VALUES (?, ?)"
    sess.execute(insert, ("a", 1), timestamp_us=111)
    sess.execute(insert, ("b", 2), timestamp_us=222)
    sess.execute(insert, ("c", 3))             # no timestamp leg
    sess.close()

    raw = cluster.session
    assert raw.calls[0] == (ddl, None)
    # one prepare per distinct CQL text (timestamped and plain variants)
    assert raw.prepares == [insert + " USING TIMESTAMP ?", insert]
    assert raw.calls[1] == (("PS", insert + " USING TIMESTAMP ?"), ("a", 1, 111))
    assert raw.calls[2] == (("PS", insert + " USING TIMESTAMP ?"), ("b", 2, 222))
    assert raw.calls[3] == (("PS", insert), ("c", 3))
    assert raw.shut and cluster.shut


def test_datastax_factory_pickles_and_guards_import():
    import pickle

    from marmaray_spark.sinks.cql_datastax import (DataStaxSessionFactory,
                                                   datastax_available)

    f = DataStaxSessionFactory(("c1.example", "c2.example"), keyspace="ks",
                               username="u", password="p", local_dc="dc1")
    f2 = pickle.loads(pickle.dumps(f))         # ships into executor closures
    assert f2 == f
    if not datastax_available():
        with pytest.raises(ImportError):        # loud, not a silent stub
            f2()
