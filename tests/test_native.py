"""Native C++ engine/CSV tests: differential vs the NumPy oracle and the
JAX kernels, plus byte-compat of the CSV codec."""

import numpy as np
import pytest

from gym2048_tpu import native
from gym2048_tpu.core import rules_np
from gym2048_tpu.data import TrainingData

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def to_val(exps):
    e = np.asarray(exps, dtype=np.int64)
    return np.where(e > 0, 1 << e, 0)


class TestEngine:
    def test_shift_row_golden(self):
        cases = [
            ([1, 1, 1, 3], [2, 1, 3, 0], 4),     # 2,2,2,8 -> 4,2,8
            ([2, 2, 2, 2], [3, 3, 0, 0], 16),    # 4,4,4,4 -> 8,8
            ([0, 1, 0, 2], [1, 2, 0, 0], 0),
            ([15, 15, 0, 0], [16, 0, 0, 0], 65536),  # 2^16 representable
        ]
        for row, expected, score in cases:
            out, s = native.shift_row(np.asarray(row, np.int8))
            assert out.tolist() == expected, row
            assert s == score, row

    def test_move_batch_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        n = 2000
        exps = rng.integers(0, 12, size=(n, 4, 4))
        exps = np.where(rng.random((n, 4, 4)) < 0.3, 0, exps).astype(np.int8)
        actions = rng.integers(0, 4, size=n).astype(np.int32)
        moved, scores, legal = native.move_batch(exps, actions)
        values = to_val(exps)
        for i in range(0, n, 7):  # sample for speed
            nb, sc, ch = rules_np.move(values[i], int(actions[i]))
            assert ch == bool(legal[i]), i
            assert sc == int(scores[i]), i
            np.testing.assert_array_equal(to_val(moved[i]), nb, str(i))

    def test_move_batch_matches_jax(self):
        import jax
        import jax.numpy as jnp

        from gym2048_tpu.core import rules

        rng = np.random.default_rng(1)
        n = 512
        exps = rng.integers(0, 16, size=(n, 4, 4))
        exps = np.where(rng.random((n, 4, 4)) < 0.3, 0, exps).astype(np.int8)
        actions = rng.integers(0, 4, size=n).astype(np.int32)

        moved_n, scores_n, legal_n = native.move_batch(exps, actions)
        moved_j, scores_j, legal_j = jax.vmap(rules.apply_action)(
            jnp.asarray(exps), jnp.asarray(actions)
        )
        np.testing.assert_array_equal(moved_n, np.asarray(moved_j))
        np.testing.assert_array_equal(scores_n, np.asarray(scores_j))
        np.testing.assert_array_equal(legal_n, np.asarray(legal_j))


class TestNativeCSV:
    def _sample_td(self, n=100, seed=0):
        rng = np.random.default_rng(seed)
        td = TrainingData()
        for i in range(n):
            e = rng.integers(0, 8, size=(4, 4))
            board = np.where(e > 0, 1 << e, 0)
            td.add(board, int(rng.integers(0, 4)),
                   float(rng.integers(0, 100)) / 4, board.T,
                   bool(rng.random() < 0.1))
        return td

    def test_native_write_matches_numpy_write(self, tmp_path):
        td = self._sample_td()
        native_path = tmp_path / "native.csv"
        td.export_csv(native_path)

        # force the numpy fallback for comparison
        import gym2048_tpu.native as nat

        saved_lib, nat._lib = nat._lib, None
        saved_err, nat._build_error = nat._build_error, "forced"
        try:
            numpy_path = tmp_path / "numpy.csv"
            td.export_csv(numpy_path)
        finally:
            nat._lib, nat._build_error = saved_lib, saved_err
        assert native_path.read_text() == numpy_path.read_text()

    def test_native_read_matches_numpy_read(self, tmp_path):
        td = self._sample_td(n=64, seed=2)
        path = tmp_path / "d.csv"
        td.export_csv(path, add_returns=True)

        td_native = TrainingData()
        td_native.import_csv(path)

        import gym2048_tpu.native as nat

        saved_lib, nat._lib = nat._lib, None
        saved_err, nat._build_error = nat._build_error, "forced"
        try:
            td_numpy = TrainingData()
            td_numpy.import_csv(path)
        finally:
            nat._lib, nat._build_error = saved_lib, saved_err

        np.testing.assert_array_equal(td_native.get_x(), td_numpy.get_x())
        np.testing.assert_allclose(
            td_native.get_reward(), td_numpy.get_reward())
        np.testing.assert_array_equal(
            td_native.get_done(), td_numpy.get_done())

    def test_csv_roundtrip_through_native(self, tmp_path):
        td = self._sample_td(n=32, seed=3)
        path = tmp_path / "rt.csv"
        td.export_csv(path)
        td2 = TrainingData()
        td2.import_csv(path)
        np.testing.assert_array_equal(td2.get_x(), td.get_x())
        np.testing.assert_array_equal(td2.get_next_x(), td.get_next_x())
        np.testing.assert_allclose(td2.get_reward(), td.get_reward())
