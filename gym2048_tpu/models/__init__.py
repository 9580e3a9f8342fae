from gym2048_tpu.models.resnet import (  # noqa: F401
    ActorCritic,
    Game2048Model,
    ResidualBlock,
    boards_to_model_input,
    build_model,
)
from gym2048_tpu.models import ntuple  # noqa: F401
