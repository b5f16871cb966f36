from fscl_tpu.core.config import (
    AudioConfig,
    AlgorithmConfig,
    AdaptConfig,
    CodebookConfig,
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
    TransformerConfig,
    UpstreamConfig,
    read_data_config,
)
from fscl_tpu.core.stats import DEFAULT_STATS, FeatureStats, GlobalStats
from fscl_tpu.core.registry import Registry, SYSTEMS, DATAMODULES, RAW_PARSERS, PREPROCESSORS
from fscl_tpu.core.prng import RngStream, py_rng, np_rng
