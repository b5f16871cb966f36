from fscl_tpu.train.optim import lr_schedule, make_optimizer
from fscl_tpu.train.precision import cast_floating, cast_params_bf16

# NB: fscl_tpu.train.trainer imports systems.base (which imports this
# package), so Trainer/make_parallel_* must be imported from
# fscl_tpu.train.trainer directly to avoid a circular import.
