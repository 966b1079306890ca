from .distill import (
    LiveTeacher,
    TeacherScores,
    distill_soft_ce,
    evenly_spaced_layers,
    stacking_layer_map,
    init_student_from_teacher,
    match_logodds,
)
from .ema import EmaState, ema_init, ema_update, swap_in
from .losses import ms_loss, word_match_loss
from .optim import (
    bert_adamw,
    clip_by_global_norm,
    clip_by_value,
    decay_mask,
    exponential_staircase_schedule,
    polynomial_warmup_schedule,
)
from .trainer import TrainConfig, Trainer, TrainState, make_loss_fn, recipe_for

__all__ = [
    "EmaState",
    "LiveTeacher",
    "TeacherScores",
    "distill_soft_ce",
    "evenly_spaced_layers",
    "stacking_layer_map",
    "init_student_from_teacher",
    "match_logodds",
    "TrainConfig",
    "TrainState",
    "Trainer",
    "bert_adamw",
    "clip_by_global_norm",
    "clip_by_value",
    "decay_mask",
    "ema_init",
    "ema_update",
    "exponential_staircase_schedule",
    "make_loss_fn",
    "ms_loss",
    "polynomial_warmup_schedule",
    "recipe_for",
    "swap_in",
    "word_match_loss",
]
