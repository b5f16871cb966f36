"""Model cards: load pre-trained systems from a registry json.

Re-provides the e2e chain's model-card mechanism
(TransEmbE2ETune.py:56-68): a json mapping model names to
{"ckpt": <checkpoint dir>, "config_paths": [<data config.yaml>, ...],
"model_config": <model yaml, optional>} so tune systems can reconstruct a
frozen BaselineSystem/TacoT2USystem from another experiment's artifacts.
"""
from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

from fscl_tpu.core.checkpoint import CheckpointManager
from fscl_tpu.core.config import (
    ModelConfig, OptimConfig, model_config_from_yaml, read_data_config,
)


def load_model_cards(path: str) -> Dict[str, dict]:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def load_baseline_from_card(
    card: dict,
    example_batch,
    optim_cfg: Optional[OptimConfig] = None,
):
    """Reconstruct a BaselineSystem + restored state from a model card.
    Returns (system, state)."""
    import jax

    from fscl_tpu.frontend import LANG_ID2SYMBOLS
    from fscl_tpu.systems.baseline import BaselineSystem

    data_configs = [read_data_config(p) for p in card["config_paths"]]
    model_cfg = (model_config_from_yaml(card["model_config"])
                 if card.get("model_config") else ModelConfig())
    id2symbols = tuple(
        (dc.symbol_id, len(LANG_ID2SYMBOLS[dc.symbol_id]))
        for dc in data_configs)
    system = BaselineSystem(model_cfg, optim_cfg or OptimConfig(), id2symbols)
    state = system.init_state(jax.random.PRNGKey(0), example_batch)
    mgr = CheckpointManager(card["ckpt"])
    state = mgr.restore_into(state)
    return system, state
