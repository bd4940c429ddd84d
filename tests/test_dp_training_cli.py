"""Data-parallel training through the CLI on the 8-device CPU mesh."""

import numpy as np
import pandas as pd


def _structs(rng, n, L=24):
    out = []
    for _ in range(n):
        k = int(rng.integers(3, 8))
        out.append("(" * k + "." * (L - 2 * k) + ")" * k)
    return out


class TestDataParallelCLI:
    def test_triplet_dp(self, tmp_path, monkeypatch):
        from ginfinity_tpu.training.train_cli import main

        rng = np.random.default_rng(7)
        n = 64
        df = pd.DataFrame(
            {
                "anchor_structure": _structs(rng, n),
                "positive_structure": _structs(rng, n),
                "negative_structure": _structs(rng, n),
            }
        )
        inp = tmp_path / "t.tsv"
        df.to_csv(inp, sep="\t", index=False)
        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", str(inp), "--model_id", "dp1",
            "--training_mode", "triplet", "--hidden_dim", "16",
            "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "4", "--num_epochs", "2", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
            "--data-parallel",
        ])
        ckpt = tmp_path / "output" / "dp1" / "dp1.pth"
        assert ckpt.exists()
        log = (tmp_path / "output" / "dp1" / "train.log").read_text()
        losses = [
            float(line.split(":", 1)[1])
            for line in log.splitlines()
            if line.startswith("Training Loss:")
        ]
        assert all(np.isfinite(losses)) and len(losses) >= 3
