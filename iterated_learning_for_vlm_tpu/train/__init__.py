from .loss import (
    clip_info_nce,
    clip_info_nce_sharded,
    cosine_distill_loss,
    label_smooth_ce,
    orthogonal_loss,
    simsiam_loss,
)
from .schedule import scheduler_entry, cosine
from .optim import (
    adamw_init,
    adamw_update,
    build_wd_tree,
    clamp_logit_scale,
    clip_grads,
    trainable_mask_tree,
)
from .train_state import TrainState
from .step import make_eval_step, make_train_step
from .il import ILController, ResetConfig, weight_reset_tree
