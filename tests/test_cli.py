"""CLI smoke tests: every reference workflow is reachable headlessly
(the reference's entry points are notebooks — readme.txt:70-100)."""
import json

import numpy as np
import pytest

from gan_danet_tpu.cli import main


@pytest.fixture()
def tiny_cfg(tmp_path):
    cfg = {"data": {"synthetic": True, "n_time": 24, "grid_05": [8, 10],
                    "grid_025": [16, 20], "grid_005": [80, 100],
                    "cache_dir": str(tmp_path / "cache")},
           "generator": {"input_channels": 46, "num_blocks": 2,
                         "num_layers_per_block": 2, "growth_rate": 8,
                         "use_pallas_attention": False},
           "discriminator": {"input_hw": [16, 20]},
           "loss": {"use_perceptual": False},
           "train": {"epochs": 1, "batch_size": 4, "dtype": "float32",
                     "checkpoint_dir": str(tmp_path / "ckpt")}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_cli_data(tiny_cfg, capsys):
    assert main(["data", "--config", tiny_cfg]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["aux_channels"] == 45
    assert out["samples"] == 72          # 24 x (1 + 2 augmented copies)


def test_cli_train_then_infer(tiny_cfg, tmp_path, capsys):
    assert main(["train", "--config", tiny_cfg]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["epochs_run"] == 1 and np.isfinite(out["mse"])

    assert main(["infer", "--config", tiny_cfg,
                 "--out", str(tmp_path / "inf")]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert -1 <= out["pearson_025"] <= 1
    assert (tmp_path / "inf" / "downscaled.h5").exists()

    # tiled stage-2 path (infer/tiling.py): same products, finite score
    assert main(["infer", "--config", tiny_cfg, "--tile", "8x10",
                 "--tile-overlap", "4", "--out", str(tmp_path / "inft")]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert -1 <= out["pearson_005"] <= 1
    assert (tmp_path / "inft" / "downscaled.h5").exists()


def test_cli_diffusion(tiny_cfg, tmp_path, capsys):
    assert main(["diffusion", "--config", tiny_cfg, "--epochs", "1",
                 "--batch-size", "4", "--steps", "2",
                 "--out", str(tmp_path / "diff")]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(out["final_loss"])
    assert (tmp_path / "diff" / "diffusion_sample.npy").exists()
