"""Config/CLI surface tests: sacred priority semantics and named overlays.

Reference: itr/config.py — in sacred, explicit `key=value` updates always
beat named-config overlays regardless of their position on the command line.
"""

import pytest

from itrx.configs import base_config, parse_cli


def test_explicit_override_beats_named_config_any_order():
    # the clobber case: k=v BEFORE the named config must still win
    cfg = parse_cli(
        ["with", "data_name=coco_precomp", "VSE_PP"], make_dirs=False
    )
    assert cfg["data_name"] == "coco_precomp"
    assert cfg["name"] == "VSE_PP"  # overlay still applied

    cfg2 = parse_cli(
        ["with", "VSE_PP", "data_name=coco_precomp"], make_dirs=False
    )
    assert cfg2["data_name"] == "coco_precomp"


def test_named_config_applies_over_base():
    cfg = parse_cli(["with", "SCAN"], make_dirs=False)
    assert cfg["img_dim"] == 2048  # SCAN overlay
    assert cfg["batch_size"] == base_config()["batch_size"]


def test_later_override_wins_among_overrides():
    cfg = parse_cli(
        ["with", "SCAN", "embed_size=512", "embed_size=256"], make_dirs=False
    )
    assert cfg["embed_size"] == 256


def test_unknown_token_raises():
    with pytest.raises(ValueError):
        parse_cli(["with", "NOT_A_METHOD"], make_dirs=False)
