"""The shipped experiment config library (config/**) loads and resolves.

Mirrors the reference's config/** tree (30 preprocess, 10 model, 26 train,
51 algorithm YAMLs): every file must load through the typed config readers,
and every non-deprecated algorithm type must resolve to a registered system
AND datamodule (the reference's main.py would KeyError otherwise too).
"""
import glob
import os

import pytest

from fscl_tpu.core.config import (
    model_config_from_yaml, read_algorithm_config, read_preprocess_config,
    train_config_from_yaml,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "config")


def _files(sub):
    out = sorted(glob.glob(os.path.join(CFG, sub, "**", "*.yaml"),
                           recursive=True))
    assert out, f"no YAMLs under config/{sub}"
    return out


ALGOS = _files("algorithm")
MODELS = _files("model")
TRAINS = _files("train")
PREPS = _files("preprocess")


def test_tree_size():
    # reference ships 51 algorithm / 10 model / 25 train / 30 preprocess
    assert len(ALGOS) >= 51
    assert len(MODELS) >= 10
    assert len(TRAINS) >= 25
    assert len(PREPS) >= 30


@pytest.mark.parametrize("path", ALGOS, ids=lambda p: os.path.relpath(p, CFG))
def test_algorithm_loads_and_resolves(path):
    import fscl_tpu.data.mix_datamodules  # noqa: F401 (registers)
    import fscl_tpu.systems  # noqa: F401 (registers)
    from fscl_tpu.core.registry import DATAMODULES, SYSTEMS

    cfg = read_algorithm_config(path)
    assert cfg.type
    assert cfg.adapt.ways >= 1
    if cfg.deprecated:
        return  # upstream's own registry can't construct these either
    assert cfg.type in SYSTEMS, f"{path}: unknown system '{cfg.type}'"
    assert cfg.type in DATAMODULES, f"{path}: no datamodule for '{cfg.type}'"


def test_algorithm_nested_layout_parsed():
    cfg = read_algorithm_config(
        os.path.join(CFG, "algorithm", "language", "fscl.yaml"))
    assert cfg.type == "fscl"
    assert (cfg.adapt.ways, cfg.adapt.shots, cfg.adapt.queries) == (1, 32, 8)
    assert cfg.adapt.adaptation_lr == pytest.approx(1e-3)
    assert cfg.adapt.adaptation_steps == 0
    assert cfg.adapt.test_adaptation_steps == 20000
    assert cfg.speaker_emb == "dvec"
    assert cfg.phoneme_emb is not None
    assert cfg.phoneme_emb.type == "codebook"
    assert cfg.phoneme_emb.size == 128
    assert cfg.phoneme_emb.attention == "soft-m"
    assert "encoder" in cfg.modules

    pr = read_algorithm_config(os.path.join(
        CFG, "algorithm", "phoneme_recognition", "ssl-baseline.yaml"))
    assert pr.adapt.shots == 20 and pr.adapt.queries == 5
    assert pr.adapt.adaptation_steps == 5
    assert pr.adapt.test_shots == 64 and pr.adapt.test_batch_size == 16


@pytest.mark.parametrize("path", MODELS, ids=lambda p: os.path.relpath(p, CFG))
def test_model_loads(path):
    cfg = model_config_from_yaml(path)
    assert cfg.transformer.encoder_hidden > 0


def test_model_reference_keys():
    cfg = model_config_from_yaml(
        os.path.join(CFG, "model", "fscl-fastspeech2.yaml"))
    assert cfg.codebook.size == 128 and cfg.codebook.num_heads == 4
    assert cfg.speaker.emb_type == "dvec"
    assert cfg.vocoder.model == "HifiGAN"
    dev = model_config_from_yaml(os.path.join(CFG, "model", "new_dev.yaml"))
    assert dev.codebook.size == 30


def test_t2u_model_yaml():
    from fscl_tpu.core.config import t2u_config_from_yaml
    t = t2u_config_from_yaml(os.path.join(CFG, "model", "tacot2u.yaml"),
                             n_units=64)
    assert t.n_units == 64
    assert t.decoder_rnn_dim == 512 and t.attention_rnn_dim == 512
    e2e = t2u_config_from_yaml(
        os.path.join(CFG, "model", "fscl-t2u-e2e.yaml"), n_units=32)
    assert e2e.d_unit == 256


@pytest.mark.parametrize("path", TRAINS, ids=lambda p: os.path.relpath(p, CFG))
def test_train_loads(path):
    cfg = train_config_from_yaml(path)
    assert cfg.total_step > 0


def test_train_reference_layout():
    cfg = train_config_from_yaml(os.path.join(CFG, "train", "fscl.yaml"))
    assert cfg.total_step == 50000 and cfg.synth_step == 2500
    assert cfg.optim.batch_size == 8
    tune = train_config_from_yaml(os.path.join(CFG, "train", "tune-500.yaml"))
    assert tune.total_step == 500 and tune.optim.lr == pytest.approx(1e-4)
    assert tune.optim.scheduler == "sqrt"
    da = train_config_from_yaml(os.path.join(CFG, "train", "tune-da.yaml"))
    assert da.optim.scheduler == "const"
    assert da.optim.anneal_steps == (200,)
    out = train_config_from_yaml(
        os.path.join(CFG, "train", "fscl-output.yaml"))
    assert out.ckpt_path == "./output/ckpt/fscl"
    # overlay merge: schedule + output paths (main.py merges train configs)
    both = train_config_from_yaml([
        os.path.join(CFG, "train", "fscl.yaml"),
        os.path.join(CFG, "train", "fscl-output.yaml")])
    assert both.total_step == 50000 and both.log_path == "./output/log/fscl"


@pytest.mark.parametrize("path", PREPS, ids=lambda p: os.path.relpath(p, CFG))
def test_preprocess_loads(path):
    from fscl_tpu.core.registry import RAW_PARSERS
    import fscl_tpu.data.parsers  # noqa: F401 (registers)

    cfg = read_preprocess_config(path)
    assert cfg.dataset and cfg.preprocessed_path
    assert cfg.audio.sampling_rate == 22050
    assert cfg.audio.n_mels == 80
    # corpora the reference's own Parsers registry supports must resolve
    supported = {"LJSpeech", "LibriTTS", "AISHELL-3", "CSS10", "kss", "JSUT",
                 "GlobalPhone", "M-AILABS", "LAD", "CSMSC", "ALFFA"}
    base = cfg.dataset.split("-")[0]
    if base in supported:
        assert cfg.parser in RAW_PARSERS, f"{path}: parser '{cfg.parser}'"


def test_preprocess_values():
    cfg = read_preprocess_config(
        os.path.join(CFG, "preprocess", "CSS10-german.yaml"))
    assert cfg.lang_id == 3 and cfg.parser == "CSS10"
    assert cfg.text_cleaners == ("basic_cleaners",)
    assert dict(cfg.subsets)["train"] == "train"
    # mel_fmax: null in the reference -> Nyquist
    assert cfg.audio.mel_fmax == pytest.approx(11025.0)
    ai = read_preprocess_config(
        os.path.join(CFG, "preprocess", "AISHELL-3.yaml"))
    assert ai.parser == "AISHELL-3" and ai.lang_id == 1
