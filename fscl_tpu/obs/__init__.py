from fscl_tpu.obs.loggers import (
    Callback, CheckpointCallback, CSVSaver, LossTableLogger, TensorBoardLogger,
)
from fscl_tpu.obs.figures import plot_attention, plot_layer_weights, plot_mel
from fscl_tpu.obs.codebook_analysis import CodebookAnalyzer, MatchingGraphInfo
from fscl_tpu.obs.profiling import PhaseTimer, trace
from fscl_tpu.obs.synth_saver import SynthSaver
