"""TrainingData container tests — golden values mirror the reference's
test_training_data.py so semantic parity is pinned (storage, stacking,
augmentation, reward math, CSV round-trip, dedup)."""

import os
from pathlib import Path

import numpy as np
import pytest

from gym2048_tpu.data import TrainingData, training_data


class TestBasics:
    def test_empty_and_add(self):
        td = TrainingData()
        assert td.get_x().shape == (0, 4, 4)
        assert td.get_y_digit().shape == (0, 1)
        td.add(np.ones([1, 4, 4]), 1, 4, np.zeros([1, 4, 4]), True)
        assert np.array_equal(td.get_x(), np.ones([1, 4, 4], dtype=int))
        assert np.array_equal(td.get_y_digit(), [[1]])
        assert np.allclose(td.get_reward(), [[4]])
        assert np.array_equal(td.get_next_x(), np.zeros([1, 4, 4], dtype=int))
        assert np.array_equal(td.get_done(), [[True]])
        assert td.size() == 1

    def test_reference_alias(self):
        assert training_data is TrainingData

    def test_get_n(self):
        td = TrainingData()
        td.add(np.ones([4, 4]), 1, 4, np.zeros([4, 4]))
        td.add(np.zeros([4, 4]), 2, 8, np.ones([4, 4]))
        state, action, reward, next_state, done = td.get_n(1)
        assert np.array_equal(state, np.zeros([4, 4], dtype=int))
        assert action == 2
        assert reward == pytest.approx(8.0)
        assert np.array_equal(next_state, np.ones([4, 4], dtype=int))
        assert not done[0]

    def test_totals(self):
        td = TrainingData()
        td.add(np.ones([4, 4]), 0, 4, np.full((4, 4), 2))
        td.add(np.zeros([4, 4]), 1, 8, np.full((4, 4), 4))
        assert td.get_total_reward() == 12
        assert td.get_highest_tile() == 4

    def test_get_x_stacked_channels(self):
        td = TrainingData()
        td.add(np.full([4, 4], 2), 0, 4, np.zeros([4, 4]))
        td.add(np.full([4, 4], 8), 1, 8, np.ones([4, 4]))
        td.add(np.full([4, 4], 2048), 1, 8, np.ones([4, 4]))
        s = td.get_x_stacked()
        assert s.shape == (3, 4, 4, 16)
        assert (s[0, :, :, 0] == 1).all()   # tile 2 -> channel 0
        assert (s[1, :, :, 2] == 1).all()   # tile 8 -> channel 2
        assert (s[2, :, :, 10] == 1).all()  # tile 2048 -> channel 10
        assert s.sum() == 3 * 16            # exactly one channel per cell

    def test_get_y_one_hot(self):
        td = TrainingData()
        for a in (0, 1, 3, 2):
            td.add(np.zeros([4, 4]), a, 1, np.zeros([4, 4]))
        expected = np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
        assert np.array_equal(td.get_y_one_hot(), expected)


class TestTransforms:
    def _td2(self):
        td = TrainingData()
        board1 = np.array(
            [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        board2 = np.array(
            [[0, 0, 0, 0], [2, 4, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        td.add(board1, 1, 2, board2)
        td.add(board2, 2, 0, board1)
        return td

    def test_hflip(self):
        td = self._td2()
        td.hflip()
        np.testing.assert_array_equal(td.get_x()[0], np.array(
            [[0, 0, 1, 1], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]))
        np.testing.assert_array_equal(td.get_x()[1], np.array(
            [[0, 0, 0, 0], [0, 0, 4, 2], [0, 0, 0, 0], [0, 0, 0, 0]]))
        np.testing.assert_array_equal(td.get_y_digit(), [[3], [2]])

    def test_rotate(self):
        td = self._td2()
        td.rotate(3)
        np.testing.assert_array_equal(td.get_x()[0], np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [1, 0, 0, 0], [1, 0, 0, 0]]))
        np.testing.assert_array_equal(td.get_x()[1], np.array(
            [[0, 0, 0, 0], [0, 0, 0, 0], [0, 4, 0, 0], [0, 2, 0, 0]]))
        np.testing.assert_array_equal(td.get_y_digit(), [[0], [1]])

    def test_augment_full_golden(self):
        td = TrainingData()
        initial = np.array(
            [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        nxt = np.array(
            [[0, 0, 0, 2], [0, 2, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]])
        td.add(initial, 1, 4, nxt)
        td.augment()
        assert td.size() == 8
        expected_y = np.array([[1], [3], [2], [0], [3], [1], [0], [2]])
        np.testing.assert_array_equal(td.get_y_digit(), expected_y)
        np.testing.assert_allclose(td.get_reward(), np.full((8, 1), 4.0))
        expected_x0_to_2 = [
            [[1, 1, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 1, 1], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]],
            [[0, 0, 0, 1], [0, 0, 0, 1], [0, 0, 0, 0], [0, 0, 0, 0]],
        ]
        for i, e in enumerate(expected_x0_to_2):
            np.testing.assert_array_equal(td.get_x()[i], np.array(e), str(i))
        np.testing.assert_array_equal(td.get_next_x()[7], np.array(
            [[0, 0, 0, 0], [0, 2, 0, 0], [0, 0, 0, 0], [2, 0, 0, 0]]))

    def test_merge_split_sample(self):
        td = TrainingData()
        for i in range(10):
            td.add(np.full((4, 4), i), i % 4, i, np.full((4, 4), i + 1))
        a, b = td.split(0.8)
        assert a.size() == 8 and b.size() == 2
        a.merge(b)
        assert a.size() == 10
        s = td.sample([2, 5])
        assert s.size() == 2
        assert (s.get_x()[0] == 2).all() and (s.get_x()[1] == 5).all()

    def test_shuffle_keeps_rows_together(self):
        np.random.seed(0)
        td = TrainingData()
        for i in range(5):
            td.add(np.full((4, 4), i), i, i, np.full((4, 4), i), (i % 2) == 1)
        td.shuffle()
        for i in range(5):
            idx = np.where(td.get_y_digit() == i)[0].item(0)
            state, action, reward, next_state, done = td.get_n(idx)
            assert (state == i).all() and action == i and reward == i
            assert done[0] == ((i % 2) == 1)

    def test_make_boards_unique(self):
        td = TrainingData()
        td.add(np.ones([1, 4, 4]), 0, 4, np.zeros([1, 4, 4]))
        td.add(np.zeros([1, 4, 4]), 1, 2, np.ones([1, 4, 4]))
        td.add(np.ones([1, 4, 4]), 2, 16, np.zeros([1, 4, 4]))
        td.add(np.zeros([1, 4, 4]), 3, 2, np.ones([1, 4, 4]))
        td.make_boards_unique()
        assert td.size() == 2
        np.testing.assert_array_equal(td.get_y_digit(), [[0], [1]])


class TestRewardMath:
    def test_log2_rewards(self):
        td = TrainingData()
        for r in (0, 2, 4, 16, 75, 2048):
            td.add(np.ones([4, 4]), 0, r, np.zeros([4, 4]))
        td.log2_rewards()
        np.testing.assert_allclose(
            td.get_reward().reshape(-1), [0, 1, 2, 4, 6.2288, 11], rtol=1e-4)

    def test_discounted_return(self):
        td = TrainingData()
        for r, d in ((4, False), (2, True), (16, False), (2, True)):
            td.add(np.ones([4, 4]), 0, r, np.zeros([4, 4]), d)
        np.testing.assert_allclose(
            td.get_discounted_return().reshape(-1), [5.8, 2.0, 17.8, 2.0])
        td2 = TrainingData()
        for r in (4, 2, 16, 2):
            td2.add(np.ones([4, 4]), 0, r, np.zeros([4, 4]))
        np.testing.assert_allclose(
            td2.get_discounted_return().reshape(-1),
            [20.218, 18.02, 17.8, 2.0])
        np.testing.assert_allclose(
            td2.get_discounted_return(gamma=0).reshape(-1), [4, 2, 16, 2])

    def test_normalize(self):
        td = TrainingData()
        for r in (4, 4, 8, 16):
            td.add(np.full((4, 4), r), 0, r, np.full((4, 4), 2 * r))
        td.normalize_rewards()
        np.testing.assert_allclose(
            td.get_reward().reshape(-1), [-0.8165, -0.8165, 0.0, 1.633],
            rtol=1e-3)
        td.normalize_boards(mean=8.0, sd=1.0)
        assert td.get_x()[0, 0, 0] == -4.0
        assert td.get_next_x()[3, 0, 0] == 24.0


class TestCSV:
    def test_header(self):
        td = TrainingData()
        h = td.construct_header()
        assert h[0] == "1-1" and h[15] == "4-4"
        assert h[16] == "action" and h[17] == "reward"
        assert h[18] == "next 1-1" and h[34] == "done"
        assert td.construct_header(True)[35] == "return"

    def test_export_format_exact(self, tmp_path):
        """Byte-exact row format of the reference exporter
        (training_data.py:245-248)."""
        td = TrainingData()
        board = np.arange(16).reshape(4, 4)
        td.add(board, 3, 2.5, board * 2, True)
        path = tmp_path / "o.csv"
        td.export_csv(path)
        lines = path.read_text().splitlines()
        assert lines[0].startswith("1-1,1-2") and lines[0].endswith("done")
        expected = (
            ",".join(str(i) for i in range(16))
            + ",3,2.500000,"
            + ",".join(str(i * 2) for i in range(16))
            + ",1"
        )
        assert lines[1] == expected

    def test_roundtrip(self, tmp_path):
        td = TrainingData()
        td.add(np.ones([1, 4, 4]), 0, 4, np.zeros([1, 4, 4]))
        td.add(np.zeros([1, 4, 4]), 1, 2, np.ones([1, 4, 4]), True)
        td.add(np.ones([1, 4, 4]), 2, 16, np.zeros([1, 4, 4]))
        td.add(np.zeros([1, 4, 4]), 3, 2, np.ones([1, 4, 4]))
        path = tmp_path / "data.csv"
        td.export_csv(path)
        td2 = TrainingData()
        td2.import_csv(path)
        np.testing.assert_array_equal(td2.get_x(), td.get_x())
        np.testing.assert_array_equal(td2.get_y_digit(), td.get_y_digit())
        np.testing.assert_allclose(td2.get_reward(), td.get_reward())
        np.testing.assert_array_equal(td2.get_next_x(), td.get_next_x())
        np.testing.assert_array_equal(td2.get_done(), td.get_done())

    def test_roundtrip_with_returns(self, tmp_path):
        td = TrainingData()
        for r, d in ((4, False), (2, True)):
            td.add(np.ones([4, 4]), 0, r, np.zeros([4, 4]), d)
        path = tmp_path / "data.csv"
        td.export_csv(path, add_returns=True)
        header = path.read_text().splitlines()[0]
        assert header.endswith("done,return")
        td2 = TrainingData()
        td2.import_csv(path)  # trailing return column ignored
        assert td2.size() == 2

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/data/test_data.csv"),
        reason="reference fixture not available",
    )
    def test_reads_reference_csv(self):
        """Interop: the reference's real 848-transition fixture loads."""
        td = TrainingData()
        td.import_csv("/root/reference/data/test_data.csv")
        assert td.size() == 848
        assert td.get_highest_tile() >= 64
        assert set(np.unique(td.get_y_digit())) <= {0, 1, 2, 3}


class TestRolloutBridge:
    def test_from_rollout_and_exponents(self):
        boards = np.array([[[0, 1, 2, 3]] + [[0] * 4] * 3], dtype=np.int8)
        nexts = np.array([[[4, 0, 0, 0]] + [[0] * 4] * 3], dtype=np.int8)
        td = TrainingData.from_rollout(boards, [2], [8.0], nexts, [False])
        np.testing.assert_array_equal(
            td.get_x()[0, 0], [0, 2, 4, 8])
        np.testing.assert_array_equal(
            td.get_next_x()[0, 0], [16, 0, 0, 0])
        np.testing.assert_array_equal(td.get_x_exponents(), boards)
