"""End-to-end CLI pipeline tests (CPU, tiny settings)."""

import json
import os
import sys

import numpy as np
import pytest

from gym2048_tpu.data import TrainingData
from gym2048_tpu.tools import (
    add_rewards,
    augment_data,
    distribute_data,
    hflip_data,
    merge_data,
    selfplay,
)
from gym2048_tpu.tools import pretrain_bc as pretrain_bc_cli
from gym2048_tpu.tools import train as train_cli
from gym2048_tpu.tools.gather import high_tile_in_corner


@pytest.fixture(scope="module")
def small_csv(tmp_path_factory):
    """A real self-play dataset (random-legal policy on the batched env)."""
    path = tmp_path_factory.mktemp("data") / "selfplay.csv"
    td = selfplay.generate(600, batch=64, seed=0)
    td.export_csv(path)
    assert td.size() >= 500
    return str(path)


class TestSelfplay:
    def test_generate_valid_transitions(self, small_csv):
        td = TrainingData()
        td.import_csv(small_csv)
        # transitions are legal moves: board != next_board
        assert (td.get_x() != td.get_next_x()).any(axis=(1, 2)).all()
        assert set(np.unique(td.get_y_digit())) <= {0, 1, 2, 3}
        assert (td.get_reward() >= 0).all()

    def test_cli(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        selfplay.main(["-o", "out.csv", "-n", "200", "--batch", "32"])
        td = TrainingData()
        td.import_csv("out.csv")
        assert td.size() >= 150


class TestCSVTools:
    def test_augment_cli(self, small_csv, tmp_path):
        out = str(tmp_path / "aug.csv")
        augment_data.main(["-o", out, small_csv])
        td0, td = TrainingData(), TrainingData()
        td0.import_csv(small_csv)
        td.import_csv(out)
        assert td.size() == 8 * td0.size()

    def test_hflip_cli(self, small_csv, tmp_path):
        out = str(tmp_path / "flip.csv")
        hflip_data.main(["-o", out, small_csv])
        td0, td = TrainingData(), TrainingData()
        td0.import_csv(small_csv)
        td.import_csv(out)
        assert td.size() == 2 * td0.size()

    def test_distribute_cli(self, small_csv, tmp_path):
        out = str(tmp_path / "dist.csv")
        distribute_data.main(["-o", out, small_csv])
        td0, td = TrainingData(), TrainingData()
        td0.import_csv(small_csv)
        td.import_csv(out)
        assert td.size() == td0.size()  # size preserved

    def test_merge_cli(self, small_csv, tmp_path):
        out = str(tmp_path / "merged.csv")
        merge_data.main(["-o", out, "--min-high-tile", "4", small_csv,
                         small_csv])
        td0, td = TrainingData(), TrainingData()
        td0.import_csv(small_csv)
        td.import_csv(out)  # trailing returns column ignored on import
        assert td.size() == 2 * td0.size()
        # merge output includes the returns column
        header = open(out).readline().strip()
        assert header.endswith("done,return")

    def test_merge_rejects_low_tile(self, small_csv, tmp_path, capsys):
        out = str(tmp_path / "m2.csv")
        merge_data.main(["-o", out, "--min-high-tile", "65536", small_csv])
        assert "Rejecting" in capsys.readouterr().out

    def test_add_rewards_cli(self, small_csv, tmp_path):
        out = str(tmp_path / "rew.csv")
        add_rewards.main(["-o", out, small_csv])
        td0, td = TrainingData(), TrainingData()
        td0.import_csv(small_csv)
        td.import_csv(out)
        # replayed rewards must equal the originally recorded ones
        np.testing.assert_allclose(td.get_reward(), td0.get_reward())


class TestPipelines:
    def test_train_pipeline_end_to_end(self, small_csv, tmp_path,
                                       monkeypatch):
        monkeypatch.chdir(tmp_path)
        train_cli.main([
            small_csv, "--output-model", "model.pkl", "--epochs", "1",
            "--filters", "8", "--residual-blocks", "1",
            "--eval-episodes", "2",
        ])
        assert os.path.exists("model.pkl")
        assert os.path.exists("scores_pretraining.csv")
        assert os.path.exists("scores_trained.csv")

    def test_pretrain_bc_pipeline(self, small_csv, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        pretrain_bc_cli.main([
            small_csv, "--output", "bc", "--epochs", "1",
            "--filters", "8", "--residual-blocks", "1", "--no-augment",
        ])
        assert os.path.exists("bc.pkl")

    def test_ppo_cli_with_pretrained_and_resume(self, small_csv, tmp_path,
                                                monkeypatch):
        monkeypatch.chdir(tmp_path)
        pretrain_bc_cli.main([
            small_csv, "--output", "bc", "--epochs", "1",
            "--filters", "8", "--residual-blocks", "1", "--no-augment",
        ])
        from gym2048_tpu.tools import ppo as ppo_cli

        common = [
            "--total-timesteps", "256", "--n-envs", "16", "--n-steps", "8",
            "--batch-size", "32", "--n-epochs", "1", "--filters", "8",
            "--residual-blocks", "1", "--video-freq", "0",
            "--save-interval", "1", "--log-interval", "1",
            "--run-name", "t",
        ]
        ppo_cli.main(common + ["--pretrained", "bc.pkl"])
        assert os.path.exists("logs/t.jsonl")
        assert os.path.exists("checkpoints/2")
        # resume from checkpoint
        ppo_cli.main(common + ["--resume", "--total-timesteps", "384"])

    def test_video_recording(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        import random

        from gym2048_tpu.utils.video import record_episode_gif

        random.seed(0)
        stats = record_episode_gif(
            lambda obs: random.randrange(4), tmp_path / "ep.gif",
            seed=3, max_steps=50,
        )
        assert os.path.exists(stats["path"])
        assert stats["frames"] == stats["steps"] + 1


class TestGatherHelpers:
    def test_high_tile_in_corner(self):
        board = np.zeros((4, 4), int)
        board[0, 0] = 64
        assert high_tile_in_corner(board)
        board2 = np.zeros((4, 4), int)
        board2[1, 1] = 64
        assert not high_tile_in_corner(board2)
        board3 = np.zeros((4, 4), int)
        board3[3, 3] = 32  # below 64
        assert not high_tile_in_corner(board3)

    def test_gather_module_imports_headless(self, monkeypatch):
        monkeypatch.setenv("SDL_VIDEODRIVER", "dummy")
        from gym2048_tpu.tools import gather

        assert callable(gather.main)
