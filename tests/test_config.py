"""Configuration tests — scope-override semantics modeled on the
reference's configWithScopes.yaml golden files (SURVEY §5)."""

import pytest

from marmaray_spark.config import Configuration

TREE = {
    "marmaray": {
        "kafka": {"source": {"max_messages": 1000000, "topic": "base_topic"}},
        "hoodie": {"parallelism": 64},
    },
    "scope_overrides": {
        "bootstrap": {"marmaray": {"kafka": {"source": {"max_messages": 10000000}}}},
        "incremental": {"marmaray": {"hoodie": {"parallelism": 8}}},
    },
}


def test_flatten_and_getters():
    c = Configuration.from_tree(TREE)
    assert c.get("marmaray.kafka.source.topic") == "base_topic"
    assert c.get_int("marmaray.kafka.source.max_messages", 0) == 1000000
    assert c.get("missing", "dflt") == "dflt"
    with pytest.raises(KeyError):
        c.get_required("nope")


def test_scope_override_deep_merge():
    boot = Configuration.from_tree(TREE, scope="bootstrap")
    assert boot.get_int("marmaray.kafka.source.max_messages", 0) == 10000000
    # untouched siblings survive the merge
    assert boot.get("marmaray.kafka.source.topic") == "base_topic"
    assert boot.get_int("marmaray.hoodie.parallelism", 0) == 64

    inc = Configuration.from_tree(TREE, scope="incremental")
    assert inc.get_int("marmaray.hoodie.parallelism", 0) == 8
    assert inc.get_int("marmaray.kafka.source.max_messages", 0) == 1000000


def test_unknown_scope_raises():
    with pytest.raises(KeyError):
        Configuration.from_tree(TREE, scope="nope")


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "conf.yaml"
    p.write_text("marmaray:\n  retry:\n    count: 3\n    wait_ms: 1000\n")
    c = Configuration.from_yaml(p)
    assert c.get_int("marmaray.retry.count", 0) == 3
    assert c.get_bool("marmaray.retry.enabled", True) is True


def test_subset():
    c = Configuration.from_tree(TREE)
    sub = c.subset("marmaray.kafka", strip=True)
    assert sub.get("source.topic") == "base_topic"
    assert len(sub) == 2


# -- reference-style scope_override_map golden files -------------------------
# Structure mirrors marmaray/src/test/resources/configWithScopes.yaml and its
# two expected outputs (TestConfigScopeResolver.testConfigOverride).

_SCOPED_TREE = {
    "scope_override_map": {"bootstrap": "default", "incremental": "default"},
    "database": {"connection": {"type": "jdbc", "port": 5000}},
    "bootstrap": {
        "spark_properties": {"spark.executor.memory": "8g",
                             "spark.network.timeout": "120s"},
        "pipeline": {"tables": {
            "from_bootstrap": {"heya": 3},
            "target_table": {"parallelism": 1000,
                             "combine_before_insert": False}}},
    },
    "incremental": {
        "spark_properties": {"spark.executor.memory": "4g",
                             "spark.network.timeout": "100s"},
        "pipeline": {"tables": {
            "target_table": {"metrics_prefix": "hoover",
                             "parallelism": 100,
                             "combine_before_insert": True}}},
    },
    "default": {
        "pipeline": {"tables": {
            "from_default": {"hello": 1},
            "target_table": {"parallelism": 10,
                             "parquet_max_file_size": 2147483647}}},
    },
}


def test_scope_override_map_bootstrap_golden():
    from marmaray_spark.config import resolve_scope_map

    out = resolve_scope_map(_SCOPED_TREE, "bootstrap")
    assert out == {
        "database": {"connection": {"type": "jdbc", "port": 5000}},
        "spark_properties": {"spark.executor.memory": "8g",
                             "spark.network.timeout": "120s"},
        "pipeline": {"tables": {
            "from_default": {"hello": 1},              # inherited non-primitive
            "from_bootstrap": {"heya": 3},             # scope non-primitive
            "target_table": {"parallelism": 1000,      # overridden
                             "combine_before_insert": False,
                             "parquet_max_file_size": 2147483647}}},  # inherited
    }


def test_scope_override_map_incremental_golden():
    from marmaray_spark.config import resolve_scope_map

    out = resolve_scope_map(_SCOPED_TREE, "incremental")
    tt = out["pipeline"]["tables"]["target_table"]
    assert tt == {"metrics_prefix": "hoover", "parallelism": 100,
                  "combine_before_insert": True,
                  "parquet_max_file_size": 2147483647}
    assert out["spark_properties"]["spark.executor.memory"] == "4g"
    assert "from_bootstrap" not in out["pipeline"]["tables"]


def test_scope_override_map_absent_scope_is_identity_and_unknown_raises():
    from marmaray_spark.config import resolve_scope_map

    assert resolve_scope_map(_SCOPED_TREE, None) == _SCOPED_TREE
    import pytest
    with pytest.raises(KeyError):
        resolve_scope_map(_SCOPED_TREE, "non-existent-scope")


def test_from_tree_detects_scope_override_map():
    cfg = Configuration.from_tree(dict(_SCOPED_TREE), scope="bootstrap")
    assert cfg.get_int("pipeline.tables.target_table.parallelism", -1) == 1000
    assert cfg.get("database.connection.type") == "jdbc"
