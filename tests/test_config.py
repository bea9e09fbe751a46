import glob
import json
import os

import pytest

from controllora_tpu.config import ControlLoRAConfig, get_preset, load_config, preset_names

REF_CONFIGS = "/root/reference/configs"


def test_defaults_match_reference_base():
    cfg = ControlLoRAConfig()
    assert cfg.num_buckets == 4
    assert cfg.lora_block_out_channels == (320, 640, 1280, 1280)
    assert len(cfg.lora_cross_attention_dims[0]) == 10
    assert len(cfg.lora_cross_attention_dims[3]) == 2
    assert sum(len(b) for b in cfg.lora_cross_attention_dims) == 32


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
@pytest.mark.parametrize("path", sorted(glob.glob(f"{REF_CONFIGS}/*.json")))
def test_reference_jsons_load(path):
    cfg = ControlLoRAConfig.from_json(path)
    name = os.path.basename(path)[: -len(".json")]
    if name.endswith("-v2"):
        assert cfg.control_version == 2
    if name == "danbooru-sketch":
        assert cfg.lora_pre_conv_skipped
        # invariant: skipped pre-conv forces control channels = encoder widths
        assert cfg.lora_control_channels == cfg.lora_block_in_channels
        assert not cfg.lora_control_self_add


@pytest.mark.skipif(not os.path.isdir(REF_CONFIGS), reason="reference not mounted")
@pytest.mark.parametrize("name", preset_names())
def test_presets_match_reference_jsons(name):
    """Programmatic presets reproduce the reference's JSON configs field-for-field."""
    if name == "base":
        ref_path = f"{REF_CONFIGS}/base.json"
    else:
        ref_path = f"{REF_CONFIGS}/{name}.json"
    if not os.path.exists(ref_path):
        pytest.skip("no matching reference json")
    assert get_preset(name) == ControlLoRAConfig.from_json(ref_path)


def test_json_round_trip(tmp_path):
    cfg = get_preset("diffusiondb-canny-v2")
    p = str(tmp_path / "cfg.json")
    cfg.save_json(p)
    assert ControlLoRAConfig.from_json(p) == cfg


def test_invariant_violation_raises():
    with pytest.raises(ValueError):
        ControlLoRAConfig(lora_block_in_channels=(128, 256, 256, 256))
