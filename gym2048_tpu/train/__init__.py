from gym2048_tpu.train.bc import (  # noqa: F401
    BCConfig,
    BCTrainer,
    build_bc_trainer_for_ppo,
)
from gym2048_tpu.train.eval import (  # noqa: F401
    choose_action,
    evaluate_batched,
    evaluate_episode,
    evaluate_model,
    make_predict_fn,
    report_evaluation_results,
)
from gym2048_tpu.train.ppo import PPO, PPOConfig  # noqa: F401
from gym2048_tpu.train.td import (  # noqa: F401
    TDConfig,
    TDTrainer,
    play_greedy,
    shard_td_state,
)
