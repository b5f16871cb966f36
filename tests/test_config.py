"""Config readers: model/train/algorithm/data YAML families."""
import os

import yaml

from fscl_tpu.core.config import (
    model_config_from_yaml, read_algorithm_config, read_data_config,
    train_config_from_yaml,
)

CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "config")


def test_model_yaml():
    cfg = model_config_from_yaml(os.path.join(CFG_DIR, "model", "base.yaml"))
    assert cfg.transformer.encoder_layer == 4
    assert cfg.transformer.conv_kernel_size == (9, 1)
    assert cfg.variance.pitch_feature == "phoneme_level"

    fscl = model_config_from_yaml(
        os.path.join(CFG_DIR, "model", "fscl-fastspeech2.yaml"))
    assert fscl.codebook.size == 128 and fscl.codebook.num_heads == 4


def test_train_yaml_and_overlay(tmp_path):
    cfg = train_config_from_yaml(os.path.join(CFG_DIR, "train", "fscl.yaml"))
    assert cfg.total_step == 50000
    assert cfg.optim.warmup_step == 4000
    assert cfg.optim.anneal_steps == (30000, 40000, 50000)
    # overlay semantics (main.py:351-357 merges multiple train configs)
    overlay = tmp_path / "debug.yaml"
    overlay.write_text(yaml.safe_dump(
        {"total_step": 10, "optimizer": {"batch_size": 2}}))
    merged = train_config_from_yaml(
        [os.path.join(CFG_DIR, "train", "fscl.yaml"), str(overlay)])
    assert merged.total_step == 10
    assert merged.optim.batch_size == 2
    assert merged.optim.lr == 1e-3    # untouched keys kept


def test_algorithm_yaml():
    cfg = read_algorithm_config(
        os.path.join(CFG_DIR, "algorithm", "language", "fscl-orig.yaml"))
    assert cfg.type == "fscl-orig"
    assert cfg.adapt.shots == 32 and cfg.adapt.queries == 8
    assert cfg.adapt.test_adaptation_steps == 20000


def test_data_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump({
        "name": "kss-4shot", "lang_id": 8,
        "subsets": {"train": "train.txt", "val": "val.txt"},
        "text_cleaners": ["basic_cleaners"],
    }))
    dc = read_data_config(str(p))
    assert dc.symbol_id == "ko"            # inferred from lang_id
    assert dc.subset_path("train").endswith("train.txt")

    # unit target infers unit symbol table
    p2 = tmp_path / "config2.yaml"
    p2.write_text(yaml.safe_dump({
        "name": "t2u", "lang_id": 0,
        "subsets": {},
        "target": {"unit_name": "hubert-64"},
    }))
    dc2 = read_data_config(str(p2))
    assert dc2.unit_name == "hubert-64"
    assert dc2.symbol_id == "hubert-64"


def test_model_yaml_speaker_emb(tmp_path):
    """Top-level speaker_emb key selects the speaker path like the
    reference model YAMLs (config/model/fscl-fastspeech2.yaml:44)."""
    p = tmp_path / "m.yaml"
    p.write_text("speaker_emb: dvec\nspeaker:\n  n_ref_slices: 6\n")
    cfg = model_config_from_yaml(str(p))
    assert cfg.speaker.emb_type == "dvec"
    assert cfg.speaker.n_ref_slices == 6
    assert cfg.speaker.uses_dvec
    p2 = tmp_path / "m2.yaml"
    p2.write_text("multi_speaker: True\n")
    assert model_config_from_yaml(str(p2)).speaker.emb_type == "table"


def test_model_yaml_upstream(tmp_path):
    p = tmp_path / "m.yaml"
    p.write_text("upstream: hubert\n")
    cfg = model_config_from_yaml(str(p))
    assert cfg.upstream.dim == 768 and cfg.upstream.n_layers == 13
    p2 = tmp_path / "m2.yaml"
    p2.write_text("upstream:\n  name: tiny\n  dim: 16\n  n_layers: 2\n")
    cfg2 = model_config_from_yaml(str(p2))
    assert cfg2.upstream.dim == 16 and cfg2.upstream.n_layers == 2
