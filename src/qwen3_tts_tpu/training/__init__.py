"""Training: teacher-forced fine-tuning of the talker + code predictor.

The reference has no training at all (SURVEY.md §5 checkpoint/resume: "no
training, so none") — this subsystem is TPU-native new ground: a jitted,
mesh-sharded train step (dp over examples, tp over heads/ffn via
``parallel.sharding``) with optax optimizers, gradient clipping and
losses that mirror the inference decomposition (codebook-0 CE for the
talker, depth-transformer CE for the residual predictor).
"""

from .loss import talker_loss, code_predictor_loss, joint_loss  # noqa: F401
from .train import (  # noqa: F401
    TrainState,
    default_optimizer,
    init_train_state,
    make_train_step,
)
from .lora import (  # noqa: F401
    LoraTrainState,
    add_lora,
    init_lora_train_state,
    make_lora_train_step,
    merge_lora,
    merge_trees,
    split_lora,
    split_subtree,
)
