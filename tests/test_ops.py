"""Golden tests for the jittable data transforms (augment, returns).

Expected values mirror the reference's training_data unit tests
(test_training_data.py:128-252, 315-368) — they pin the augmentation
ordering, the action remaps and the reward math.
"""

import jax.numpy as jnp
import numpy as np

from gym2048_tpu.ops import augment, returns

BOARD1 = np.array(
    [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
BOARD2 = np.array(
    [[0, 0, 0, 0], [2, 4, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])


class TestHflip:
    def test_hflip_boards_and_actions(self):
        boards = jnp.asarray(np.stack([BOARD1, BOARD2]))
        acts = jnp.asarray([[1], [2]])
        fb = np.asarray(augment.hflip_boards(boards))
        fa = np.asarray(augment.hflip_actions(acts))
        np.testing.assert_array_equal(fb[0], np.array(
            [[0, 0, 1, 1], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]))
        np.testing.assert_array_equal(fb[1], np.array(
            [[0, 0, 0, 0], [0, 0, 4, 2], [0, 0, 0, 0], [0, 0, 0, 0]]))
        np.testing.assert_array_equal(fa, np.array([[3], [2]]))


class TestRotate:
    def test_rotate3(self):
        boards = jnp.asarray(np.stack([BOARD1, BOARD2]))
        acts = jnp.asarray([[1], [2]])
        rb = np.asarray(augment.rotate_boards(boards, 3))
        ra = np.asarray(augment.rotate_actions(acts, 3))
        np.testing.assert_array_equal(rb[0], np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]]))
        np.testing.assert_array_equal(rb[1], np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 4, 0, 0], [0, 2, 0, 0]]))
        np.testing.assert_array_equal(ra, np.array([[0], [1]]))


class TestAugment8:
    def test_full_8x_reference_order(self):
        initial = np.array(
            [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        nxt = np.array(
            [[0, 0, 0, 2], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        b, a, n = augment.augment8(
            jnp.asarray(initial[None]), jnp.asarray([[1]]), jnp.asarray(nxt[None])
        )
        expected_x = np.array([
            [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 1, 1], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 1], [0, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 1], [0, 0, 0, 1]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 1, 1]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [1, 1, 0, 0]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]],
            [[1, 0, 0, 0], [1, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
        ])
        expected_y = np.array([[1], [3], [2], [0], [3], [1], [0], [2]])
        expected_next = np.array([
            [[0, 0, 0, 2], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[2, 0, 0, 0], [0, 0, 2, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 0], [0, 0, 2, 0], [0, 0, 0, 0], [0, 0, 0, 2]],
            [[0, 0, 0, 2], [0, 0, 0, 0], [0, 0, 2, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 2, 0], [2, 0, 0, 0]],
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 2]],
            [[2, 0, 0, 0], [0, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0], [2, 0, 0, 0]],
        ])
        np.testing.assert_array_equal(np.asarray(b), expected_x)
        np.testing.assert_array_equal(np.asarray(a), expected_y)
        np.testing.assert_array_equal(np.asarray(n), expected_next)

    def test_augment_preserves_transitions(self):
        """Each augmented (board, action, next) must be a valid transition:
        applying the remapped action to the transformed board must give the
        transformed next board (symmetry equivariance of the rules)."""
        from gym2048_tpu.core import rules_np

        rng = np.random.default_rng(5)
        # build genuine transitions with the oracle
        boards, acts, nexts = [], [], []
        board = np.array(
            [[2, 2, 4, 0], [0, 4, 4, 2], [2, 0, 8, 8], [2, 2, 2, 2]])
        for d in range(4):
            nb, _, ch = rules_np.move(board, d)
            if ch:
                boards.append(board)
                acts.append(d)
                nexts.append(nb)
        b, a, n = augment.augment8(
            jnp.asarray(np.stack(boards)),
            jnp.asarray(np.asarray(acts)),
            jnp.asarray(np.stack(nexts)),
        )
        b, a, n = map(np.asarray, (b, a, n))
        for i in range(len(b)):
            nb, _, ch = rules_np.move(b[i], int(a[i]))
            assert ch, i
            np.testing.assert_array_equal(nb, n[i], err_msg=str(i))


class TestReturns:
    def test_log2_rewards(self):
        r = jnp.asarray([0.0, 2, 4, 16, 75, 2048])
        out = np.asarray(returns.log2_rewards(r))
        np.testing.assert_allclose(
            out, [0, 1, 2, 4, 6.2288, 11], rtol=1e-4)

    def test_discounted_return_no_dones(self):
        r = jnp.asarray([4.0, 2, 16, 2])
        d = jnp.zeros(4, bool)
        out = np.asarray(returns.discounted_returns(r, d, gamma=0.9))
        np.testing.assert_allclose(out, [20.218, 18.02, 17.8, 2.0], rtol=1e-5)

    def test_discounted_return_gamma0(self):
        r = jnp.asarray([4.0, 2, 16, 2])
        out = np.asarray(returns.discounted_returns(r, jnp.zeros(4, bool), 0.0))
        np.testing.assert_allclose(out, [4, 2, 16, 2])

    def test_discounted_return_with_dones(self):
        r = jnp.asarray([4.0, 2, 16, 2])
        d = jnp.asarray([False, True, False, True])
        out = np.asarray(returns.discounted_returns(r, d, gamma=0.9))
        np.testing.assert_allclose(out, [5.8, 2.0, 17.8, 2.0], rtol=1e-6)

    def test_normalize(self):
        r = jnp.asarray([4.0, 4, 8, 16])
        out = np.asarray(returns.normalize(r))
        np.testing.assert_allclose(
            out, [-0.8165, -0.8165, 0.0, 1.633], rtol=1e-3)
        out2 = np.asarray(returns.normalize(r, mean=8.0, sd=1.0))
        np.testing.assert_allclose(out2, [-4, -4, 0, 8])

    def test_gae_matches_manual(self):
        rewards = jnp.asarray([1.0, 0.0, 2.0])
        values = jnp.asarray([0.5, 0.6, 0.7])
        dones = jnp.asarray([False, False, True])
        last_value = jnp.float32(9.9)  # must be ignored: last step is done
        adv, ret = returns.gae(rewards, values, dones, last_value,
                               gamma=0.99, lam=0.95)
        # manual backward pass
        d2 = 2.0 - 0.7
        a2 = d2
        d1 = 0.0 + 0.99 * 0.7 - 0.6
        a1 = d1 + 0.99 * 0.95 * a2
        d0 = 1.0 + 0.99 * 0.6 - 0.5
        a0 = d0 + 0.99 * 0.95 * a1
        np.testing.assert_allclose(np.asarray(adv), [a0, a1, a2], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ret), np.asarray(adv) + np.asarray(values), rtol=1e-6)
