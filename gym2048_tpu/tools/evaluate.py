"""Standalone model evaluation CLI.

The reference's own docs reference an ``evaluate.py`` that does not exist
in the repo (stale agents.md — SURVEY.md preamble); its evaluation lives
inline in train.py. This tool exposes both evaluators directly:

* the exact reference protocol (train.py:122-229): N host episodes,
  epsilon-greedy, env seed 456+i / agent seed 123+i, 2000-move cap,
  illegal reward -1, ``scores_<label>.csv`` report;
* ``--fast``: all episodes in parallel on device.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    import jax

    from gym2048_tpu.models import ActorCritic, Game2048Model
    from gym2048_tpu.train import (
        evaluate_batched,
        evaluate_model,
        make_predict_fn,
        report_evaluation_results,
    )
    from gym2048_tpu.utils.checkpoint import load_model

    p = argparse.ArgumentParser(description="Evaluate a saved 2048 model")
    p.add_argument("model", help="Model .pkl from train/pretrain_bc/ppo")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--epsilon", type=float, default=0.1)
    p.add_argument("--label", default="eval",
                   help="scores_<label>.csv output label")
    p.add_argument("--fast", action="store_true",
                   help="batched on-device evaluation")
    p.add_argument("--seed", type=int, default=0,
                   help="PRNG seed for --fast mode")
    p.add_argument("--mask-illegal", action="store_true",
                   help="restrict the policy to legal moves (use for "
                        "models trained with --mask-illegal; --fast only)")
    args = p.parse_args(argv)

    variables, meta = load_model(args.model)
    cls = ActorCritic if meta.get("model") == "ActorCritic" else Game2048Model
    model = cls(
        filters=meta.get("filters", 64),
        residual_blocks=meta.get("residual_blocks", 4),
    )

    if args.fast:
        results = evaluate_batched(
            model, variables, args.episodes, args.epsilon,
            key=jax.random.PRNGKey(args.seed),
            mask_illegal=args.mask_illegal,
        )
        print(
            f"Highest tile: {results['Highest tile']}, Average score: "
            f"{results['Average score']:.1f}, Max score: "
            f"{results['Max score']:.1f}"
        )
    else:
        results = evaluate_model(
            make_predict_fn(model, variables), args.episodes, args.epsilon
        )
    report_evaluation_results(results, args.label)
    print(f"Wrote scores_{args.label}.csv")


if __name__ == "__main__":
    main()
