from fscl_tpu.systems.base import System, TrainState, create_state, apply_grads
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.systems.fscl import TransEmbSystem, Episode, transplant_embedding
from fscl_tpu.systems.t2u import (
    TacoT2USystem, TransEmbT2USystem, T2UBatch, T2UEpisode, DA,
    GradientReversal, UnitDiscriminator, schedule_f, e2e_u2s_forward,
)


def get_system(algorithm_type: str):
    """System registry lookup (reference: lightning/systems/__init__.py:56-64)."""
    from fscl_tpu.core.registry import SYSTEMS
    return SYSTEMS.get(algorithm_type)
