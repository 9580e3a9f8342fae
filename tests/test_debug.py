"""Determinism/safety utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym2048_tpu.env import batched
from gym2048_tpu.utils.debug import (
    assert_finite_tree,
    trajectory_fingerprint,
    validate_boards,
)


class TestValidateBoards:
    def test_valid_state_passes(self):
        state = batched.reset(jax.random.PRNGKey(0), 16)
        ok = validate_boards(state.board, enabled=False)
        assert np.asarray(ok).all()

    def test_invalid_board_flagged(self):
        bad = jnp.full((2, 4, 4), 30, jnp.int8)  # exponent out of range
        ok = validate_boards(bad, enabled=False)
        assert not np.asarray(ok).any()


class TestFiniteTree:
    def test_passes_on_finite(self):
        assert_finite_tree({"a": jnp.ones(3), "b": np.zeros(2)})

    def test_raises_on_nan(self):
        with pytest.raises(FloatingPointError, match="a"):
            assert_finite_tree({"a": jnp.asarray([1.0, jnp.nan])})


class TestFingerprint:
    def test_same_seed_same_fingerprint_across_topologies(self):
        from gym2048_tpu.parallel import make_mesh, shard_env_state

        def rollout(state):
            def body(s, _):
                key = jax.random.fold_in(s.key, 5)
                mask = batched.legal_actions(s)
                act = jax.random.categorical(
                    key, jnp.where(mask, 0.0, -1e9), axis=-1)
                s, ts = batched.step(s, act)
                return s, (ts.board, ts.reward, ts.terminated)
            return jax.lax.scan(body, state, None, length=30)

        s1 = batched.reset(jax.random.PRNGKey(9), 32)
        _, (b1, r1, d1) = rollout(s1)
        f1 = trajectory_fingerprint(b1, r1, d1)

        mesh = make_mesh(jax.devices()[:8])
        s8 = shard_env_state(batched.reset(jax.random.PRNGKey(9), 32), mesh)
        _, (b8, r8, d8) = rollout(s8)
        f8 = trajectory_fingerprint(b8, r8, d8)
        assert f1 == f8

        # different seed -> different fingerprint
        s2 = batched.reset(jax.random.PRNGKey(10), 32)
        _, (b2, r2, d2) = rollout(s2)
        assert trajectory_fingerprint(b2, r2, d2) != f1
