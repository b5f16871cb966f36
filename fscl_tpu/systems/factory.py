"""System factory: algorithm type + configs -> constructed System.

Bridges the registry (class lookup) and the varying constructor signatures
so the CLI can instantiate any of the 30 reference algorithm keys from
(model_config, train_config, data_configs) — the reference does this inside
main.py via get_system(...)(configs...) (main.py:147-199).
"""
from __future__ import annotations

from typing import Optional, Sequence

from fscl_tpu.core.config import (
    AlgorithmConfig, DataConfig, ModelConfig, OptimConfig,
)
from fscl_tpu.core.registry import SYSTEMS
from fscl_tpu.models.tacotron2_t2u import T2UConfig


def _id2symbols(data_configs: Sequence[DataConfig]):
    from fscl_tpu.data.datamodules import build_id2symbols
    return build_id2symbols(data_configs)


def _n_units(data_configs) -> int:
    from fscl_tpu.frontend import n_symbols
    for dc in data_configs:
        if dc.unit_name:
            return n_symbols(dc.unit_name)
    raise ValueError("no data config carries a unit target")


def build_system(
    algorithm_type: str,
    model_cfg: ModelConfig,
    optim_cfg: OptimConfig,
    data_configs: Sequence[DataConfig],
    algo_cfg: Optional[AlgorithmConfig] = None,
    t2u_cfg: Optional[T2UConfig] = None,
    **extra,
):
    """Instantiate the system registered under `algorithm_type`."""
    cls = SYSTEMS.get(algorithm_type)
    id2symbols = _id2symbols(data_configs)
    adapt = (algo_cfg.adapt if algo_cfg is not None else None)

    t = algorithm_type
    if t in ("baseline", "baseline-tune", "fscl-orig-tune", "fscl-tune"):
        return cls(model_cfg, optim_cfg, id2symbols, **extra)
    if t in ("fscl", "fscl-orig", "fscl-ada", "fscl-ada1", "fscl-ada2",
             "fscl-ssl_ada", "fscl-ssl_ada1", "fscl-ssl_ada2",
             "semi-fscl", "semi-fscl-tune"):
        n_symbols = max(n for _, n in id2symbols)
        kwargs = dict(extra)
        if t.endswith("ada2") or t.endswith("_ada2"):
            kwargs.setdefault("ada_stage", "unsup_tuning")
        elif "ada" in t:
            kwargs.setdefault("ada_stage", "matching")
        return cls(model_cfg, optim_cfg, n_symbols, **kwargs)
    if t in ("fscl-orig2", "maml", "meta", "imaml"):
        n_symbols = max(n for _, n in id2symbols)
        kwargs = dict(extra)
        if adapt is not None:
            kwargs.setdefault("adaptation_lr", adapt.adaptation_lr)
            kwargs.setdefault("adaptation_steps",
                              max(adapt.adaptation_steps, 1))
        if t == "imaml" and algo_cfg is not None:
            kwargs.setdefault("cg_steps", algo_cfg.imaml_cg_steps)
            kwargs.setdefault("reg_param", algo_cfg.imaml_reg_param)
        return cls(model_cfg, optim_cfg, n_symbols, **kwargs)
    if t == "conti-ae":
        return cls(model_cfg, optim_cfg, **extra)
    if t in ("tacot2u", "fscl-t2u-tune", "fscl-t2u-orig-tune",
             "fscl-t2u-da-tune"):
        tcfg = t2u_cfg or T2UConfig(n_units=_n_units(data_configs))
        return cls(model_cfg, optim_cfg, id2symbols, tcfg, **extra)
    if t.startswith("fscl-t2u") and "e2e" in t:
        tcfg = t2u_cfg or T2UConfig(n_units=_n_units(data_configs))
        assert "u2s_system" in extra and "u2s_params" in extra, (
            "e2e tune systems need a loaded u2s (systems.model_cards)")
        return cls(model_cfg, optim_cfg, id2symbols, tcfg, **extra)
    if t.startswith("fscl-t2u"):
        tcfg = t2u_cfg or T2UConfig(n_units=_n_units(data_configs))
        n_symbols = max(n for _, n in id2symbols)
        return cls(model_cfg, optim_cfg, n_symbols, tcfg, **extra)
    if t.startswith("pr-"):
        return cls(model_cfg, optim_cfg, id2symbols, **extra)
    raise NotImplementedError(t)
