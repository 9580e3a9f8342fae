"""Supervised training pipeline CLI.

Mirrors the reference ``train.py`` main (train.py:232-293): load CSV ->
shuffle -> 80/20 split -> augment + dedup the training split -> pre-train
evaluation -> train -> validation metrics -> save model -> post-train
evaluation. Flag surface matches train.py:239-247, with TPU extras
(``--fast-eval`` runs the batched device evaluator instead of the
episode-by-episode host protocol).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    p.add_argument("input", help="Training data CSV file")
    p.add_argument("--output-model", default="model.pkl",
                   help="Output model path")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--filters", type=int, default=64)
    p.add_argument("--residual-blocks", type=int, default=8)
    p.add_argument("--eval-episodes", type=int, default=10)
    p.add_argument("--eval-epsilon", type=float, default=0.1)
    p.add_argument("--fast-eval", action="store_true",
                   help="Use the batched on-device evaluator")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None) -> None:
    from gym2048_tpu.data import TrainingData
    from gym2048_tpu.models import Game2048Model
    from gym2048_tpu.train import (
        BCConfig,
        BCTrainer,
        evaluate_batched,
        evaluate_model,
        make_predict_fn,
        report_evaluation_results,
    )
    from gym2048_tpu.utils.checkpoint import save_model

    args = parse_args(argv)
    print(f"JAX devices: {jax.devices()}")

    model = Game2048Model(
        filters=args.filters, residual_blocks=args.residual_blocks
    )
    trainer = BCTrainer(
        model,
        BCConfig(epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
                 seed=args.seed),
    )
    variables = trainer.init_variables(jax.random.PRNGKey(args.seed))

    data = TrainingData()
    data.import_csv(args.input)
    data.shuffle()
    training, validation = data.split(0.8)
    training.augment()
    training.make_boards_unique()
    print(f"{training.size()} training / {validation.size()} validation samples")

    def run_eval(variables, label):
        if args.eval_episodes <= 0:
            return
        if args.fast_eval:
            results = evaluate_batched(
                model, variables, args.eval_episodes, args.eval_epsilon
            )
        else:
            results = evaluate_model(
                make_predict_fn(model, variables),
                args.eval_episodes, args.eval_epsilon,
            )
        report_evaluation_results(results, label)
        print(
            f"[{label}] Highest tile: {results['Highest tile']}, "
            f"Average score: {results['Average score']:.1f}, "
            f"Max score: {results['Max score']:.1f}"
        )

    run_eval(variables, "pretraining")

    variables, _ = trainer.fit(
        variables,
        training.get_x_exponents(),
        training.get_y_digit(),
    )

    val = trainer.evaluate(
        variables, validation.get_x_exponents(), validation.get_y_digit()
    )
    print(
        f"Validation — loss: {val['loss']:.4f} — "
        f"accuracy: {val['accuracy']:.4f}"
    )

    save_model(
        args.output_model, variables,
        {"filters": args.filters, "residual_blocks": args.residual_blocks,
         "model": "Game2048Model"},
    )
    print(f"Model saved to {args.output_model}")

    run_eval(variables, "trained")


if __name__ == "__main__":
    main()
