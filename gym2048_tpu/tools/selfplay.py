"""Self-play training-data generator (TPU-native; no reference counterpart).

Rolls out the batched env with a policy (random-legal, or a trained model)
and exports the transitions in the standard 35-column CSV schema — the
device-scale replacement for the reference's human-in-the-loop collector
when bootstrap data is needed.
"""

from __future__ import annotations

import argparse


def generate(
    n_transitions: int,
    policy: str = "random",
    model_path: str | None = None,
    batch: int = 256,
    seed: int = 0,
    epsilon: float = 0.0,
):
    """Collect ``n_transitions`` (board, action, reward, next, done) tuples.

    Only legal moves are recorded (like the human collector, which skips
    illegal entries — gather_training_data.py:194-198).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gym2048_tpu.data import TrainingData
    from gym2048_tpu.env import EnvConfig, batched
    from gym2048_tpu.models import boards_to_model_input

    model = None
    variables = None
    if policy == "model":
        from gym2048_tpu.models import ActorCritic, Game2048Model
        from gym2048_tpu.utils.checkpoint import load_model

        variables, meta = load_model(model_path)
        cls = ActorCritic if meta.get("model") == "ActorCritic" else Game2048Model
        kwargs = {
            "filters": meta.get("filters", 64),
            "residual_blocks": meta.get("residual_blocks", 4),
        }
        model = cls(**kwargs)

    cfg = EnvConfig(auto_reset=True)
    steps = -(-n_transitions // batch)

    @jax.jit
    def rollout(state):
        def body(state, _):
            key = jax.random.fold_in(state.key, 7)
            mask = batched.legal_actions(state)
            if model is None:
                logits = jnp.where(mask, 0.0, -1e9)
                act = jax.random.categorical(key, logits, axis=-1)
            else:
                out = model.apply(
                    variables, boards_to_model_input(state.board),
                    train=False,
                )
                logits = out[0] if isinstance(out, tuple) else jnp.log(
                    jnp.maximum(out, 1e-30))
                greedy = logits.argmax(-1).astype(jnp.int32)
                k1, k2 = jax.random.split(key)
                explore = jax.random.uniform(k1, greedy.shape) <= epsilon
                rand = jax.random.randint(k2, greedy.shape, 0, 4)
                act = jnp.where(explore, rand, greedy)
            before = state.board
            state, ts = batched.step(state, act, cfg)
            # ts.final_board is the true post-transition board (pre-reset);
            # ts.board would leak the next episode's reset board into next_x
            return state, (before, act, ts.reward, ts.final_board,
                           ts.terminated, ts.illegal)
        return jax.lax.scan(body, state, None, length=steps)

    state = batched.reset(jax.random.PRNGKey(seed), batch)
    _, (boards, actions, rewards, nexts, dones, illegal) = rollout(state)

    # time-major (T, B) -> per-env-contiguous (B*T) so episodes stay in
    # game order for return computation
    def flat(x):
        x = np.asarray(x)
        return np.swapaxes(x, 0, 1).reshape((-1,) + x.shape[2:])

    boards, actions, rewards, nexts, dones, illegal = map(
        flat, (boards, actions, rewards, nexts, dones, illegal))

    # Drop illegal transitions (board unchanged — not a training signal;
    # the reference collector also skips them) but keep their episode
    # boundary: an illegal move terminates, so mark the previous kept row
    # of the same episode as done.
    keep = ~illegal
    dropped_done = illegal & dones
    env_of = np.arange(len(keep)) // steps
    for i in np.nonzero(dropped_done)[0]:
        j = i - 1
        # walk past other dropped rows, staying inside this env's slice
        # and this episode (an earlier done ends the search)
        while j >= 0 and env_of[j] == env_of[i] and not keep[j] \
                and not dones[j]:
            j -= 1
        if j >= 0 and env_of[j] == env_of[i] and keep[j] and not dones[j]:
            dones[j] = True
    td = TrainingData.from_rollout(
        boards[keep], actions[keep], rewards[keep], nexts[keep], dones[keep]
    )
    return td


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--output", "-o", default="selfplay.csv")
    p.add_argument("--transitions", "-n", type=int, default=10000)
    p.add_argument("--policy", choices=["random", "model"], default="random")
    p.add_argument("--model", default=None, help="Model for --policy model")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--epsilon", type=float, default=0.0)
    args = p.parse_args(argv)

    td = generate(
        args.transitions, args.policy, args.model, args.batch, args.seed,
        args.epsilon,
    )
    td.export_csv(args.output)
    print(f"{td.size()} transitions written to {args.output} "
          f"(highest tile {td.get_highest_tile()})")


if __name__ == "__main__":
    main()
