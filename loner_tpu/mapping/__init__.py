from loner_tpu.mapping.keyframe import KeyFrame, KeyFrameWindow, stack_window
from loner_tpu.mapping.optimizer import (
    MapperConfig,
    MapperState,
    init_mapper_state,
    make_train_step,
)
