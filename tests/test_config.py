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
