"""Golden-value tests for the core rules kernels.

The expected vectors are the 2048 game specification as pinned down by the
reference unit tests (env/envs/test_game2048_env.py:10-151): single-pass
compact+merge ordering, per-direction move results with scores, and terminal
detection. Both the JAX exponent-space kernel and the NumPy value-space
oracle must agree with them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.core import rules, rules_np

# (input row, expected row, expected score) in tile values.
# Covers every merge-ordering subtlety: leftmost-first, no double merge.
SHIFT_CASES = [
    ([0, 0, 0, 0], [0, 0, 0, 0], 0),
    ([0, 2, 0, 0], [2, 0, 0, 0], 0),
    ([0, 2, 0, 4], [2, 4, 0, 0], 0),
    ([2, 4, 8, 16], [2, 4, 8, 16], 0),
    ([2, 2, 8, 0], [4, 8, 0, 0], 4),
    ([4, 2, 2, 4], [4, 4, 4, 0], 4),
    ([2, 2, 2, 8], [4, 2, 8, 0], 4),
    ([2, 8, 4, 4], [2, 8, 8, 0], 8),
    ([2, 2, 4, 4], [4, 8, 0, 0], 12),
    ([2, 4, 4, 4], [2, 8, 4, 0], 8),
    ([4, 4, 4, 4], [8, 8, 0, 0], 16),
    ([0, 2, 2, 8], [4, 8, 0, 0], 4),
    ([2, 0, 2, 2], [4, 2, 0, 0], 4),
    ([16, 16, 16, 16], [32, 32, 0, 0], 64),
]

TEST_BOARD = [
    [0, 2, 0, 4],
    [2, 2, 8, 0],
    [2, 2, 2, 8],
    [2, 2, 4, 4],
]

# direction -> (expected board, expected score); from the reference move tests.
MOVE_CASES = {
    0: ([[4, 4, 8, 4], [2, 4, 2, 8], [0, 0, 4, 4], [0, 0, 0, 0]], 12),
    1: ([[0, 0, 2, 4], [0, 0, 4, 8], [0, 2, 4, 8], [0, 0, 4, 8]], 20),
    2: ([[0, 0, 0, 0], [0, 0, 8, 4], [2, 4, 2, 8], [4, 4, 4, 4]], 12),
    3: ([[2, 4, 0, 0], [4, 8, 0, 0], [4, 2, 8, 0], [4, 8, 0, 0]], 20),
}


def to_exp(values):
    v = np.asarray(values, dtype=np.int64)
    out = np.zeros_like(v, dtype=np.int8)
    nz = v > 0
    out[nz] = np.round(np.log2(v[nz])).astype(np.int8)
    return out


def to_val(exps):
    e = np.asarray(exps, dtype=np.int64)
    return np.where(e > 0, 1 << e, 0)


class TestShiftJax:
    @pytest.mark.parametrize("row,expected,score", SHIFT_CASES)
    def test_shift(self, row, expected, score):
        new, s = rules._compact_merge_rows(jnp.asarray(to_exp(row), jnp.int32))
        assert to_val(np.asarray(new)).tolist() == expected
        assert int(s) == score

    def test_shift_batched(self):
        rows = jnp.asarray(to_exp([c[0] for c in SHIFT_CASES]), jnp.int32)
        new, s = rules._compact_merge_rows(rows)
        assert to_val(np.asarray(new)).tolist() == [c[1] for c in SHIFT_CASES]
        assert np.asarray(s).tolist() == [c[2] for c in SHIFT_CASES]


class TestShiftNp:
    @pytest.mark.parametrize("row,expected,score", SHIFT_CASES)
    def test_shift(self, row, expected, score):
        assert rules_np.shift_row_left(row) == (expected, score)


class TestMove:
    @pytest.mark.parametrize("direction", [0, 1, 2, 3])
    def test_move_jax(self, direction):
        board = jnp.asarray(to_exp(TEST_BOARD))
        moved, scores, changed = rules.move_all(board)
        expected, score = MOVE_CASES[direction]
        assert to_val(np.asarray(moved[direction])).tolist() == expected
        assert int(scores[direction]) == score
        assert bool(changed[direction])

    @pytest.mark.parametrize("direction", [0, 1, 2, 3])
    def test_move_np(self, direction):
        new, score, changed = rules_np.move(np.asarray(TEST_BOARD), direction)
        expected, exp_score = MOVE_CASES[direction]
        assert new.tolist() == expected
        assert score == exp_score
        assert changed

    def test_illegal_move_unchanged(self):
        # After moving left, another left must not change the board.
        after_left = np.asarray(MOVE_CASES[3][0])
        new, score, changed = rules_np.move(after_left, 3)
        assert not changed
        assert new.tolist() == after_left.tolist()

        board = jnp.asarray(to_exp(after_left))
        new_b, score_b, legal = rules.apply_action(board, jnp.int32(3))
        assert not bool(legal)
        assert int(score_b) == 0
        assert np.array_equal(np.asarray(new_b), np.asarray(board))

    def test_follow_on_move(self):
        # Reference test: left on TEST_BOARD then down scores 8.
        after_left = np.asarray(MOVE_CASES[3][0])
        new, score, changed = rules_np.move(after_left, 2)
        assert score == 8
        assert new.tolist() == [
            [0, 4, 0, 0],
            [2, 8, 0, 0],
            [4, 2, 0, 0],
            [8, 8, 8, 0],
        ]
        board = jnp.asarray(to_exp(after_left))
        new_b, score_b, legal = rules.apply_action(board, jnp.int32(2))
        assert bool(legal) and int(score_b) == 8
        assert to_val(np.asarray(new_b)).tolist() == new.tolist()


class TestTerminal:
    FULL_MERGEABLE = [[2] * 4] * 4
    FULL_DEAD = [
        [2, 4, 8, 16],
        [4, 8, 16, 2],
        [8, 16, 2, 4],
        [16, 2, 4, 8],
    ]

    def test_full_board_with_merges_not_dead(self):
        assert not rules_np.is_dead(np.asarray(self.FULL_MERGEABLE))
        assert not bool(rules.is_dead(jnp.asarray(to_exp(self.FULL_MERGEABLE))))

    def test_full_board_no_merges_dead(self):
        assert rules_np.is_dead(np.asarray(self.FULL_DEAD))
        assert bool(rules.is_dead(jnp.asarray(to_exp(self.FULL_DEAD))))

    def test_empty_cell_not_dead(self):
        board = [r[:] for r in self.FULL_DEAD]
        board[3][3] = 0
        assert not rules_np.is_dead(np.asarray(board))
        assert not bool(rules.is_dead(jnp.asarray(to_exp(board))))

    def test_dead_iff_no_legal_move(self):
        # is_dead must equal "no direction changes the board" on random boards.
        rng = np.random.default_rng(0)
        boards = rng.integers(0, 6, size=(200, 4, 4))
        boards = np.where(rng.random((200, 4, 4)) < 0.2, 0, boards)
        values = np.where(boards > 0, 1 << boards, 0)
        for vb in values:
            assert rules_np.is_dead(vb) == (not rules_np.legal_mask(vb).any())
        _, _, changed = jax.vmap(rules.move_all)(jnp.asarray(boards, jnp.int8))
        dead = jax.vmap(rules.is_dead)(jnp.asarray(boards, jnp.int8))
        np.testing.assert_array_equal(
            np.asarray(dead), ~np.asarray(changed).any(axis=1)
        )


class TestCrossEngine:
    def test_random_boards_agree(self):
        """JAX kernel and NumPy oracle agree on moves of random boards."""
        rng = np.random.default_rng(42)
        exps = rng.integers(0, 12, size=(500, 4, 4)).astype(np.int8)
        exps = np.where(rng.random((500, 4, 4)) < 0.3, 0, exps).astype(np.int8)
        values = np.where(exps > 0, 1 << exps.astype(np.int64), 0)

        moved, scores, changed = jax.vmap(rules.move_all)(jnp.asarray(exps))
        moved, scores, changed = map(np.asarray, (moved, scores, changed))
        for i in range(500):
            for d in range(4):
                nb, sc, ch = rules_np.move(values[i], d)
                assert ch == bool(changed[i, d]), (i, d)
                assert sc == int(scores[i, d]), (i, d)
                if ch:
                    np.testing.assert_array_equal(nb, to_val(moved[i, d]))


class TestSpawn:
    def test_spawn_fills_empty_uniformly(self):
        board = jnp.zeros((4, 4), jnp.int8)
        key = jax.random.PRNGKey(0)
        u = jax.random.uniform(key, (2000, 2))
        spawned = jax.vmap(lambda uv: rules.spawn(board, uv[0], uv[1]))(u)
        spawned = np.asarray(spawned)
        # Exactly one tile added per spawn
        assert (np.count_nonzero(spawned.reshape(2000, 16), axis=1) == 1).all()
        vals = spawned.sum(axis=(1, 2))
        frac2 = (vals == 1).mean()
        assert 0.85 < frac2 < 0.95  # p(2)=0.9
        # All 16 positions hit
        pos = spawned.reshape(2000, 16).argmax(axis=1)
        assert len(np.unique(pos)) == 16

    def test_spawn_respects_occupancy(self):
        board = jnp.asarray(to_exp([[2, 4, 8, 16]] * 3 + [[0, 0, 0, 2]]))
        key = jax.random.PRNGKey(1)
        u = jax.random.uniform(key, (100, 2))
        spawned = jax.vmap(lambda uv: rules.spawn(board, uv[0], uv[1]))(u)
        diff = np.asarray(spawned) - np.asarray(board)[None]
        # New tile only ever lands on the 3 empty cells
        changed_cells = np.argwhere(diff != 0)
        assert set(map(tuple, changed_cells[:, 1:])) <= {(3, 0), (3, 1), (3, 2)}

    def test_spawn_ranked_first_empty_in_order(self):
        board = jnp.asarray(to_exp([[2, 0, 4, 0]] + [[2, 4, 8, 16]] * 3))
        rank_np = np.arange(16)
        rank_np[0], rank_np[3] = 3, 0  # shuffle order visits flat cell 3 first
        # empty cells are flat 1 (rank 1) and flat 3 (rank 0) -> cell 3 wins
        out = rules.spawn_ranked(board, jnp.int8(2), jnp.asarray(rank_np))
        diff = np.asarray(out) - np.asarray(board)
        assert diff[0, 3] == 2 and np.count_nonzero(diff) == 1

    def test_helpers(self):
        board = jnp.asarray(to_exp(TEST_BOARD))
        assert int(rules.highest(board)) == 8
        assert int(rules.count_empty(board)) == 3
        assert int(rules.highest(jnp.zeros((4, 4), jnp.int8))) == 0
        np.testing.assert_array_equal(
            np.asarray(rules.exp_to_value(board)), np.asarray(TEST_BOARD)
        )
        np.testing.assert_array_equal(
            np.asarray(rules.value_to_exp(jnp.asarray(TEST_BOARD))),
            to_exp(TEST_BOARD),
        )
