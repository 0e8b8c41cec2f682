import os

import pytest

from richsem_tpu.config import Config, parse_override_options

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs", "richsem")


def test_base_inheritance(tmp_path):
    (tmp_path / "base.py").write_text("a = 1\nb = dict(x=1, y=2)\nc = 'base'\n")
    (tmp_path / "leaf.py").write_text(
        "_base_ = ['base.py']\nb = dict(y=3, z=4)\nc = 'leaf'\n"
    )
    cfg = Config.fromfile(str(tmp_path / "leaf.py"))
    assert cfg.a == 1
    assert cfg.b.x == 1 and cfg.b.y == 3 and cfg.b.z == 4
    assert cfg.c == "leaf"


def test_delete_key(tmp_path):
    (tmp_path / "base.py").write_text("b = dict(x=1, y=2)\n")
    (tmp_path / "leaf.py").write_text(
        "_base_ = ['base.py']\nb = dict(_delete_=True, z=4)\n"
    )
    cfg = Config.fromfile(str(tmp_path / "leaf.py"))
    assert cfg.b == {"z": 4}


def test_multi_base_order(tmp_path):
    (tmp_path / "a.py").write_text("k = 'a'\nonly_a = 1\n")
    (tmp_path / "b.py").write_text("k = 'b'\nonly_b = 2\n")
    (tmp_path / "leaf.py").write_text("_base_ = ['a.py', 'b.py']\n")
    cfg = Config.fromfile(str(tmp_path / "leaf.py"))
    assert cfg.k == "b" and cfg.only_a == 1 and cfg.only_b == 2


def test_merge_from_dict():
    cfg = Config.from_dict({"a": {"b": 1}, "c": 2})
    cfg.merge_from_dict({"a.b": 5, "a.new": 6, "d": 7})
    assert cfg.a.b == 5 and cfg.a.new == 6 and cfg.c == 2 and cfg.d == 7


def test_parse_override_options():
    opts = parse_override_options(["lr=0.01", "use_dn=false", "scales=1,2,3", "name=x"])
    assert opts["lr"] == 0.01
    assert opts["use_dn"] is False
    assert opts["scales"] == [1, 2, 3]
    assert opts["name"] == "x"
    with pytest.raises(ValueError):
        parse_override_options(["bad"])


def test_preset_richsem_4scale():
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "richsem_4scale_lvis.py"))
    # recipe parity with the reference headline config
    assert cfg.epochs == 24 and cfg.lr_drop == 20
    assert cfg.use_language and cfg.use_visual_distill
    assert cfg.num_queries == 900 and cfg.num_classes == 1204
    assert cfg.hidden_dim == 256 and cfg.nheads == 8
    assert cfg.enc_layers == 6 and cfg.dec_layers == 6
    assert cfg.num_feature_levels == 4 and cfg.enc_n_points == 4
    assert cfg.dn_number == 100 and cfg.use_dn
    assert cfg.use_fed_loss and cfg.fed_num_sample_cats == 50
    assert cfg.use_rfs and cfg.rfs_repeat_sh == 0.001
    assert cfg.clip_model == "RN50"
    assert cfg.data_aug_scales[0] == 480 and cfg.data_aug_max_size == 1333


def test_dump_roundtrip(tmp_path):
    cfg = Config.fromfile(os.path.join(CONFIG_DIR, "dino_4scale_lvis.py"))
    p = tmp_path / "dump.json"
    cfg.dump(str(p))
    import json

    loaded = Config.from_dict(json.loads(p.read_text()))
    assert loaded.num_queries == cfg.num_queries
