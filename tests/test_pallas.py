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


def _reference_step_uniform(boards, u):
    """XLA reference of one rollout-kernel step with given uniforms.

    Reimplements the kernel's semantics with core.rules ops and identical
    f32 index arithmetic: action = r-th legal direction with
    r = int(u0 * n_legal); spawn via rules.spawn (same k = floor(u*n_empty)
    law as _spawn_cm); dead-or-won boards auto-reset to two fresh spawns
    from uniform rows 1-4.
    """
    b = boards.shape[0]
    moved, scores, legal = jax.vmap(rules.move_all)(boards)
    legal_i = legal.astype(jnp.int32)
    n_legal = legal_i.sum(-1)
    dead = n_legal == 0
    r = (u[0] * n_legal.astype(jnp.float32)).astype(jnp.int32)
    r = jnp.minimum(r, jnp.maximum(n_legal - 1, 0))
    cum = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(legal_i, -1)[:, :3]], -1
    )
    action = (
        (legal & (cum == r[:, None])) * jnp.arange(4)[None, :]
    ).sum(-1)
    sel = jnp.arange(4)[None, :] == action[:, None]
    after = jnp.where(sel[:, :, None, None], moved, 0).sum(1).astype(
        boards.dtype
    )
    move_score = jnp.where(sel, scores, 0).sum(-1)
    stepped = rules.spawn(after, u[2], u[1])  # (board, u_val, u_pos)
    zero = jnp.zeros_like(boards)
    fresh = rules.spawn(rules.spawn(zero, u[2], u[1]), u[4], u[3])
    new_board = jnp.where(dead[:, None, None], fresh, stepped)
    score = jnp.where(dead, 0.0, move_score.astype(jnp.float32))
    return new_board, score, dead.astype(jnp.int32), action


class TestStepUniformKernel:
    """The rollout kernel's full step dataflow — action selection, spawn,
    auto-reset — validated on CPU in interpret mode by feeding the same
    uniforms to the kernel and to an XLA reference (closes the round-1 gap
    where only the TPU-only statistics job covered this code)."""

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla_reference_bit_exact(self, seed):
        n = 256
        rng = np.random.default_rng(seed)
        boards = random_boards(n, seed, max_exp=8, p_zero=0.5)
        # include some dead boards to exercise the auto-reset branch
        dead = np.asarray(
            [[1, 2, 3, 4], [5, 6, 7, 8], [1, 2, 3, 4], [5, 6, 7, 8]],
            np.int8,
        )
        boards[:8] = dead
        u = rng.random((8, n)).astype(np.float32)

        cm = pallas_step.to_cell_major(jnp.asarray(boards))
        out_cm, score, eps, action = pallas_step.fused_step_uniform(
            cm, jnp.asarray(u), 256, 0, not ON_TPU
        )
        got_board = pallas_step.from_cell_major(out_cm)

        want_board, want_score, want_eps, want_action = (
            _reference_step_uniform(jnp.asarray(boards), jnp.asarray(u))
        )
        np.testing.assert_array_equal(
            np.asarray(action), np.asarray(want_action)
        )
        np.testing.assert_array_equal(
            np.asarray(got_board), np.asarray(want_board)
        )
        np.testing.assert_array_equal(
            np.asarray(score), np.asarray(want_score)
        )
        np.testing.assert_array_equal(np.asarray(eps), np.asarray(want_eps))

    def test_multi_step_scan_stays_consistent(self):
        # several uniform-fed steps in sequence keep boards valid and
        # scores equal to the XLA reference (catches carry-shape bugs)
        n = 128
        rng = np.random.default_rng(3)
        boards = jnp.asarray(random_boards(n, 3, max_exp=6, p_zero=0.6))
        cm = pallas_step.to_cell_major(boards)
        ref = boards
        for t in range(5):
            u = jnp.asarray(rng.random((8, n)).astype(np.float32))
            cm, s_k, e_k, a_k = pallas_step.fused_step_uniform(
                cm, u, 128, 0, not ON_TPU
            )
            ref, s_r, e_r, a_r = _reference_step_uniform(ref, u)
            np.testing.assert_array_equal(
                np.asarray(pallas_step.from_cell_major(cm)),
                np.asarray(ref), err_msg=f"step {t}",
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


class TestTableGatherKernel:
    """DMA-ring table gather (models/pallas_table.py — the round-5
    Pallas table-op study artifact): exactness under the interpreter;
    performance is measured on chip (docs/PERF.md round-5)."""

    def test_gather_exact_vs_xla(self):
        from gym2048_tpu.models import pallas_table

        rng = np.random.default_rng(0)
        table = jnp.asarray(
            rng.normal(size=128 * 257).astype(np.float32)
        )
        idx = jnp.asarray(
            rng.integers(0, table.shape[0], size=1024).astype(np.int32)
        )
        got = pallas_table.gather_values(
            table, idx, chunk=256, n_sem=8, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(table)[np.asarray(idx)]
        )

    def test_duplicate_and_boundary_indices(self):
        from gym2048_tpu.models import pallas_table

        table = jnp.arange(128 * 16, dtype=jnp.float32)
        idx = jnp.asarray(
            [0, 127, 128, 128 * 16 - 1, 5, 5, 5, 0] * 32, jnp.int32
        )
        got = pallas_table.gather_values(
            table, idx, chunk=128, n_sem=4, interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(table)[np.asarray(idx)]
        )
