from fscl_tpu.train.optim import lr_schedule, make_optimizer
from fscl_tpu.train.precision import cast_floating, cast_params_bf16
from fscl_tpu.train.trainer import (
    Trainer, make_parallel_eval_step, make_parallel_train_step, place_batch,
)
