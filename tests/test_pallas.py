"""Pallas kernel tests.

On CPU the deterministic move kernel runs under the interpreter and is
checked bit-exactly against the XLA kernels; the PRNG-driven rollout kernel
can only run on real TPU (the interpreter's PRNG emulation returns
constants), where it is validated by scripts under the TPU runner — its
statistics (ep len ~123, score/step ~9.1) match the XLA env.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.core import pallas_step, rules

ON_TPU = jax.devices()[0].platform not in ("cpu",)


def random_boards(n, seed=0, max_exp=14, p_zero=0.35):
    rng = np.random.default_rng(seed)
    exps = rng.integers(0, max_exp, size=(n, 4, 4))
    return np.where(
        rng.random((n, 4, 4)) < p_zero, 0, exps
    ).astype(np.int8)


class TestLayout:
    def test_cell_major_roundtrip(self):
        boards = jnp.asarray(random_boards(64))
        cm = pallas_step.to_cell_major(boards)
        assert cm.shape == (16, 64)
        back = pallas_step.from_cell_major(cm)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(boards))

    def test_cell_mapping_inverse(self):
        # every (direction, line, k) maps a distinct cell, and the rebuild
        # indices in _apply_action invert _cell
        for d in range(4):
            cells = sorted(
                pallas_step._cell(d, l, k)
                for l in range(4)
                for k in range(4)
            )
            assert cells == list(range(16))


class TestMoveKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_xla_bit_exact(self, seed):
        n = 512
        exps = random_boards(n, seed)
        actions = np.random.default_rng(seed).integers(0, 4, n).astype(
            np.int32)
        cm = pallas_step.to_cell_major(jnp.asarray(exps))
        moved_cm, scores, legal = pallas_step.fused_move(
            cm, jnp.asarray(actions), 512, not ON_TPU
        )
        moved = pallas_step.from_cell_major(moved_cm)
        moved_x, scores_x, legal_x = jax.vmap(rules.apply_action)(
            jnp.asarray(exps), jnp.asarray(actions)
        )
        np.testing.assert_array_equal(np.asarray(moved), np.asarray(moved_x))
        np.testing.assert_array_equal(np.asarray(scores),
                                      np.asarray(scores_x))
        np.testing.assert_array_equal(
            np.asarray(legal).astype(bool), np.asarray(legal_x)
        )


@pytest.mark.skipif(not ON_TPU, reason="rollout kernel needs real TPU PRNG")
class TestRolloutKernel:
    def test_statistics_match_reference_env(self):
        B, T = 4096, 1500
        cm = pallas_step.to_cell_major(jnp.zeros((B, 4, 4), jnp.int8))
        out_cm, scores, eps, totals = pallas_step.fused_rollout(
            cm, 11, T, 1024
        )
        eps = np.asarray(eps)
        totals = np.asarray(totals)
        ep_len = T * B / max(eps.sum(), 1)
        assert 100 < ep_len < 150          # random play dies at ~123 moves
        assert 8.0 < totals.mean() / T < 10.5  # ~9.1 score per step
        boards = np.asarray(pallas_step.from_cell_major(out_cm))
        distinct = len(np.unique(boards.reshape(B, 16), axis=0))
        assert distinct > 0.9 * B
