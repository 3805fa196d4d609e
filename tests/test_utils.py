import os

import pytest
import yaml

from dc_vic_tpu.utils import (
    Config,
    Registry,
    apply_cli_overrides,
    iter2str,
    load_config,
)
from dc_vic_tpu.utils.config import load_yaml_with_base


def _write(tmp_path, name, data):
    p = tmp_path / name
    with open(p, "w") as f:
        yaml.safe_dump(data, f)
    return str(p)


def test_registry_roundtrip():
    reg = Registry("demo")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert "Foo" in reg
    with pytest.raises(KeyError):
        reg.get("Bar")
    with pytest.raises(KeyError):
        reg.register(Foo)  # duplicate


def test_base_inheritance_and_delete(tmp_path):
    _write(tmp_path, "base.yaml", {
        "model": {"type": "A", "ch": 192, "sub": {"x": 1, "y": 2}},
        "lr": 1e-4,
    })
    child = _write(tmp_path, "child.yaml", {
        "_base_": "./base.yaml",
        "model": {"ch": 64, "sub": {"_delete_": True, "z": 3}},
    })
    cfg = load_yaml_with_base(child)
    assert cfg["model"]["type"] == "A"       # inherited
    assert cfg["model"]["ch"] == 64          # overridden
    assert cfg["model"]["sub"] == {"z": 3}   # _delete_ replaced subtree
    assert cfg["lr"] == 1e-4


def test_multi_base_duplicate_key_error(tmp_path):
    _write(tmp_path, "a.yaml", {"k": 1})
    _write(tmp_path, "b.yaml", {"k": 2})
    child = _write(tmp_path, "c.yaml", {"_base_": ["./a.yaml", "./b.yaml"]})
    with pytest.raises(KeyError):
        load_yaml_with_base(child)


def test_nested_base_chain(tmp_path):
    _write(tmp_path, "g.yaml", {"a": 1, "b": {"c": 2}})
    _write(tmp_path, "p.yaml", {"_base_": "./g.yaml", "b": {"d": 3}})
    child = _write(tmp_path, "c.yaml", {"_base_": "./p.yaml", "a": 9})
    cfg = load_yaml_with_base(child)
    assert cfg == {"a": 9, "b": {"c": 2, "d": 3}}


def test_cli_overrides_and_attr_access(tmp_path):
    child = _write(tmp_path, "c.yaml", {"model": {"type": "A", "ch": 8}})
    cfg = load_config(child, overrides=["model.ch=32", "optim.lr=0.001"])
    assert cfg.model.ch == 32
    assert cfg.optim.lr == 0.001
    assert cfg.model.type == "A"
    assert cfg.exp == "c"
    assert isinstance(cfg.model, Config)


def test_iter2str():
    assert iter2str(500000) == "500K"
    assert iter2str(1500) == "1500"  # not a multiple of 1000? 1500 % 1000 != 0
    assert iter2str(5000) == "5K"
    assert iter2str(999) == "999"
