from fscl_tpu.systems.base import System, TrainState, create_state, apply_grads
from fscl_tpu.systems.baseline import BaselineSystem
from fscl_tpu.systems.fscl import TransEmbSystem, Episode, transplant_embedding
from fscl_tpu.systems.maml import MAMLTransEmbSystem, inner_adapt, fast_adaptation_scan
from fscl_tpu.systems.tune import (
    adapt_on_chip, build_reference_table, tune_init,
)
from fscl_tpu.systems.t2u import (
    TacoT2USystem, TransEmbT2USystem, T2UBatch, T2UEpisode, DA,
    GradientReversal, UnitDiscriminator, schedule_f,
)
from fscl_tpu.systems.t2u_tune import (
    DABatch, DATuneSystem, E2EBatch, E2ETuneSystem, t2u_tune_init,
    t2u_build_reference_table,
)
from fscl_tpu.systems.pr import (
    PRBatch, PREpisode, SSLBaselineSystem, SSLClusterSystem, SSLLinearSystem,
    SSLProtoNetSystem,
)
from fscl_tpu.systems.ada import (
    ADAEncoder, SSLEpisode, TransEmbADASystem, TransEmbSSLADASystem,
)
from fscl_tpu.systems.conti_ae import (
    ContiAEBatch, ContiAESystem, SemiEpisode, SemiTransEmbSystem,
)


def get_system(algorithm_type: str):
    """System registry lookup (reference: lightning/systems/__init__.py:56-64)."""
    from fscl_tpu.core.registry import SYSTEMS
    return SYSTEMS.get(algorithm_type)
