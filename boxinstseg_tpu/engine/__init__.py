from .optimizers import build_optimizer
from .schedules import build_lr_schedule, poly_lr_schedule, step_lr_schedule
from .train_state import (TrainState, create_train_state, init_variables,
                          make_eval_step, make_train_step,
                          make_ts_train_step)
from .checkpoints import latest_step, restore_checkpoint, save_checkpoint

__all__ = ['build_optimizer', 'build_lr_schedule', 'poly_lr_schedule',
           'step_lr_schedule', 'TrainState', 'create_train_state',
           'init_variables', 'make_eval_step', 'make_train_step',
           'make_ts_train_step',
           'latest_step', 'restore_checkpoint', 'save_checkpoint']
