from fscl_tpu.obs.loggers import (
    Callback, CheckpointCallback, CSVSaver, LossTableLogger, TensorBoardLogger,
)
from fscl_tpu.obs.figures import plot_attention, plot_layer_weights, plot_mel
