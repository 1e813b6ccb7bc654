from extdm_tpu.train.ae_trainer import AETrainer, AETrainState
from extdm_tpu.train.checkpoint import (
    gate_best,
    load_checkpoint,
    restore_like,
    save_checkpoint,
    select_gate_metric,
    start_step_from_example,
)
from extdm_tpu.train.dm_trainer import DMTrainer, DMTrainState
from extdm_tpu.train.lr_schedule import multi_step, warmup_cosine, warmup_linear

__all__ = [
    "AETrainer",
    "AETrainState",
    "DMTrainer",
    "DMTrainState",
    "multi_step",
    "warmup_cosine",
    "warmup_linear",
    "save_checkpoint",
    "load_checkpoint",
    "restore_like",
    "start_step_from_example",
    "gate_best",
    "select_gate_metric",
]
