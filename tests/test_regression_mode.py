"""Regression training mode: MSE(1 - cos(anchor, positive), target)."""

import numpy as np
import pandas as pd


def _structs(rng, n, L=24):
    out = []
    for _ in range(n):
        k = int(rng.integers(3, 8))
        out.append("(" * k + "." * (L - 2 * k) + ")" * k)
    return out


class TestRegressionMode:
    def test_train_cli(self, tmp_path, monkeypatch):
        from ginfinity_tpu.training.train_cli import main

        rng = np.random.default_rng(5)
        n = 20
        df = pd.DataFrame(
            {
                "anchor_structure": _structs(rng, n),
                "positive_structure": _structs(rng, n),
                "f_total_modifications": rng.random(n),
            }
        )
        inp = tmp_path / "pairs.tsv"
        df.to_csv(inp, sep="\t", index=False)
        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", str(inp), "--model_id", "r1",
            "--training_mode", "regression", "--hidden_dim", "16",
            "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "8", "--num_epochs", "2", "--lr", "0.02",
            "--decay_rate", "0.9", "--val_fraction", "0.25",
        ])
        ckpt = tmp_path / "output" / "r1" / "r1.pth"
        assert ckpt.exists()
        log = (tmp_path / "output" / "r1" / "train.log").read_text()
        losses = [
            float(line.split(":", 1)[1])
            for line in log.splitlines()
            if line.startswith("Training Loss:")
        ]
        assert all(np.isfinite(losses))

    def test_loss_semantics(self):
        """pred = 1 - cos(a, p); masked MSE."""
        import jax
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import batch_graphs
        from ginfinity_tpu.graphs.build import build_graph_arrays
        from ginfinity_tpu.models.gine import GINConfig, GINModel, init_params
        from ginfinity_tpu.training.train import PairBatch, regression_loss_fn

        cfg = GINConfig.create(hidden_dim=8, output_dim=4, gin_layers=1)
        params, state = init_params(jax.random.PRNGKey(0), cfg)
        g = build_graph_arrays("((..))")
        b = batch_graphs([g], graph_capacity=2)
        batch = PairBatch(
            anchor=b, positive=b,
            target=jnp.asarray([0.0, 99.0]),  # padded slot must not count
            mask=jnp.asarray([1.0, 0.0]),
        )
        loss, _ = regression_loss_fn()(cfg, params, state, batch, None)
        # identical graphs -> cos=1 -> pred=0 -> (0 - 0)^2 = 0
        assert float(loss) < 1e-6
