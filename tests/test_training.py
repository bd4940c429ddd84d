"""Training: loss parity vs the reference's torch losses, end-to-end
train CLI runs for all three modes, and schedule chaining."""

import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference/src")


def _rand_structs(rng, n, L=30):
    out = []
    for _ in range(n):
        # simple hairpin-ish structures with random stem length
        k = int(rng.integers(3, L // 3))
        dots = L - 2 * k
        out.append("(" * k + "." * dots + ")" * k)
    return out


class TestAlignmentLossParity:
    def test_matches_reference_loss(self, reference_utils):
        """Fixed-shape masked loss == reference AlignmentContrastiveLoss
        when no subsampling applies (max_negatives covers everything)."""
        import torch

        from ginfinity.training.alignment_loss import AlignmentContrastiveLoss

        from ginfinity_tpu.training.losses import (
            AlignmentLossConfig,
            alignment_contrastive_loss,
        )

        rng = np.random.default_rng(0)
        n, d = 40, 16
        emb = rng.normal(size=(n, d)).astype(np.float32)
        labels = rng.integers(0, 12, size=n).astype(np.int64)
        graph_ids = rng.integers(0, 4, size=n).astype(np.int64)
        categories = rng.integers(0, 6, size=n).astype(np.int64)

        ref = AlignmentContrastiveLoss(margin=0.2, max_negatives=10**6, temperature=0.1)
        ref_loss = float(
            ref(
                torch.from_numpy(emb),
                torch.from_numpy(labels),
                torch.from_numpy(graph_ids),
                torch.from_numpy(categories),
            )
        )
        ours = float(
            alignment_contrastive_loss(
                emb,
                labels,
                graph_ids.astype(np.int32),
                categories.astype(np.int32),
                np.ones(n, np.float32),
                AlignmentLossConfig(margin=0.2, temperature=0.1),
            )
        )
        assert abs(ours - ref_loss) < 1e-3, (ours, ref_loss)

    def test_matches_reference_loss_subsampling_regime(self, reference_utils):
        """With max_negatives below the candidate count, the host-side
        subset selection + fixed-shape loss must equal the reference loss.
        The random permutation is pinned to identity on both sides so the
        candidate sets match exactly."""
        import torch

        from ginfinity.training.alignment_loss import AlignmentContrastiveLoss

        from ginfinity_tpu.training.data import subsample_negatives
        from ginfinity_tpu.training.losses import (
            AlignmentLossConfig,
            alignment_contrastive_loss,
        )

        rng = np.random.default_rng(7)
        n, d = 60, 16
        emb = rng.normal(size=(n, d)).astype(np.float32)
        labels = rng.integers(0, 10, size=n).astype(np.int64)
        graph_ids = rng.integers(0, 5, size=n).astype(np.int64)
        categories = rng.integers(0, 6, size=n).astype(np.int64)
        # force genuinely duplicate labels in the same graph to be distinct
        # (the real assembler guarantees one label per graph)
        seen = set()
        for i in range(n):
            while (int(labels[i]), int(graph_ids[i])) in seen:
                labels[i] += 100
            seen.add((int(labels[i]), int(graph_ids[i])))

        max_neg = 8
        ref = AlignmentContrastiveLoss(
            margin=0.2, max_negatives=max_neg, hard_negative_fraction=0.85,
            temperature=0.1,
        )
        orig_randperm = torch.randperm
        torch.randperm = lambda m, **kw: torch.arange(m)
        try:
            ref_loss = float(
                ref(
                    torch.from_numpy(emb),
                    torch.from_numpy(labels),
                    torch.from_numpy(graph_ids),
                    torch.from_numpy(categories),
                )
            )
        finally:
            torch.randperm = orig_randperm

        class IdentityRng:
            def permutation(self, x):
                return np.asarray(x)

        keep = subsample_negatives(
            labels, graph_ids.astype(np.int32), categories.astype(np.int32),
            max_neg, 0.85, IdentityRng(),
        )
        assert keep.size < n  # the regime actually subsamples
        ours = float(
            alignment_contrastive_loss(
                emb[keep],
                labels[keep],
                graph_ids[keep].astype(np.int32),
                categories[keep].astype(np.int32),
                np.ones(keep.size, np.float32),
                AlignmentLossConfig(margin=0.2, temperature=0.1),
            )
        )
        assert abs(ours - ref_loss) < 1e-3, (ours, ref_loss)

    def test_subsample_negatives_semantics(self):
        from ginfinity_tpu.training.data import subsample_negatives

        # two participating (label 5 on graphs 0/1, conserved), six candidates
        labels = np.array([5, 5, 1, 2, 3, 4, 6, 7], np.int64)
        graphs = np.array([0, 1, 0, 0, 1, 1, 0, 1], np.int32)
        cats = np.array([0, 1, 0, 1, 2, 5, 5, 5], np.int32)  # 3 hard, 3 easy
        rng = np.random.default_rng(0)

        # participating-only when max_negatives is 0/None (reference docs)
        np.testing.assert_array_equal(
            subsample_negatives(labels, graphs, cats, 0, 0.85, rng), [0, 1]
        )
        np.testing.assert_array_equal(
            subsample_negatives(labels, graphs, cats, None, 0.85, rng), [0, 1]
        )
        # cap respected, participating always kept
        keep = subsample_negatives(labels, graphs, cats, 4, 0.85, rng)
        assert set([0, 1]).issubset(set(keep.tolist()))
        assert keep.size == 2 + 4
        # easy backfills a hard deficit (n_hard clipped BEFORE n_easy):
        # frac=1.0 wants 6 hard, only 3 exist -> n_easy = 6-3 = 3 -> all kept
        keep_backfill = subsample_negatives(labels, graphs, cats, 6, 1.0, rng)
        assert keep_backfill.size == 8
        # but hard does NOT backfill an easy deficit: frac=0.0 wants 6 easy,
        # only 3 exist -> the 3 hard candidates are dropped
        keep_easy = subsample_negatives(labels, graphs, cats, 6, 0.0, rng)
        assert keep_easy.size == 2 + 3
        assert all(cats[i] >= 3 for i in keep_easy if i not in (0, 1))

    def test_assembler_applies_subsampling(self, alignment_data):
        """--alignment_max_negatives must actually shrink the batch."""
        import json as _json

        import pandas as pd

        from ginfinity_tpu.training.data import (
            AlignmentDataset,
            assemble_alignment_batch,
        )

        data_p, map_p = alignment_data
        df = pd.read_csv(data_p, sep="\t")
        with open(map_p) as f:
            amap = _json.load(f)
        ds = AlignmentDataset(df, amap)
        rng = np.random.default_rng(0)
        full = assemble_alignment_batch(list(ds.groups), 16, rng)
        sub = assemble_alignment_batch(
            list(ds.groups), 16, rng, max_negatives=2, hard_negative_fraction=0.85
        )
        assert float(np.sum(np.asarray(sub.valid))) < float(
            np.sum(np.asarray(full.valid))
        )
        # all conserved labels with cross-graph partners survive
        lab = np.asarray(sub.labels)[np.asarray(sub.valid) > 0]
        assert (lab >= 0).sum() > 0

    def test_padding_invariance(self):
        """Padded entries must not change the loss."""
        from ginfinity_tpu.training.losses import alignment_contrastive_loss

        rng = np.random.default_rng(1)
        n, d = 20, 8
        emb = rng.normal(size=(n, d)).astype(np.float32)
        labels = rng.integers(0, 5, size=n).astype(np.int64)
        graph_ids = rng.integers(0, 3, size=n).astype(np.int32)
        categories = rng.integers(0, 6, size=n).astype(np.int32)
        base = float(
            alignment_contrastive_loss(emb, labels, graph_ids, categories, np.ones(n, np.float32))
        )
        pad = 12
        emb_p = np.concatenate([emb, rng.normal(size=(pad, d)).astype(np.float32)])
        labels_p = np.concatenate([labels, -2_000_000_000 - np.arange(pad)])
        graph_p = np.concatenate([graph_ids, np.full(pad, -1, np.int32)])
        cat_p = np.concatenate([categories, np.full(pad, 5, np.int32)])
        valid_p = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        padded = float(
            alignment_contrastive_loss(emb_p, labels_p, graph_p, cat_p, valid_p)
        )
        assert abs(base - padded) < 1e-4


@pytest.fixture(scope="module")
def triplet_tsv(tmp_path_factory):
    rng = np.random.default_rng(2)
    p = tmp_path_factory.mktemp("tr") / "triplets.tsv"
    n = 24
    df = pd.DataFrame(
        {
            "anchor_structure": _rand_structs(rng, n),
            "positive_structure": _rand_structs(rng, n),
            "negative_structure": _rand_structs(rng, n),
        }
    )
    df.to_csv(p, sep="\t", index=False)
    return str(p)


@pytest.fixture(scope="module")
def alignment_data(tmp_path_factory):
    rng = np.random.default_rng(3)
    d = tmp_path_factory.mktemp("al")
    rows = []
    amap = {}
    for a in range(4):
        aid = f"aln{a}"
        amap[aid] = {}
        for s in range(3):
            L = 24
            k = 6
            struct = "(" * k + "." * (L - 2 * k) + ")" * k
            rows.append(
                {
                    "alignment_id": aid,
                    "sequence_id": s,
                    "structure": struct,
                    "sequence": "ACGU" * 6,
                }
            )
            # new-format map: conserved stems + unaligned middles (1-based)
            amap[aid][str(s)] = {
                "5-paired": {str(i + 1): i for i in range(k)},
                "3-paired": {str(L - k + i + 1): 100 + i for i in range(k)},
                "unaligned-unpaired": {str(k + 1 + i): -1 for i in range(4)},
            }
    df = pd.DataFrame(rows)
    data_p = d / "align.tsv"
    df.to_csv(data_p, sep="\t", index=False)
    map_p = d / "map.json"
    with open(map_p, "w") as f:
        json.dump(amap, f)
    return str(data_p), str(map_p)


class TestTrainCLI:
    def test_triplet_mode(self, triplet_tsv, tmp_path, monkeypatch):
        from ginfinity_tpu.training.train_cli import main

        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", triplet_tsv, "--model_id", "t1",
            "--training_mode", "triplet", "--hidden_dim", "16",
            "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "8", "--num_epochs", "2", "--lr", "0.01",
            "--decay_rate", "0.9", "--val_fraction", "0.25",
        ])
        ckpt = tmp_path / "output" / "t1" / "t1.pth"
        assert ckpt.exists()
        # reload through the torch-interop path
        from ginfinity_tpu.models.checkpoint import import_torch_checkpoint

        cfg, params, state, extra = import_torch_checkpoint(str(ckpt))
        assert cfg.hidden_dims == (16, 16)
        assert "epoch" in extra

    def test_alignment_mode_loss_decreases(self, alignment_data, tmp_path, monkeypatch):
        from ginfinity_tpu.training.train_cli import main

        data_p, map_p = alignment_data
        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", data_p, "--alignment_map_path", map_p,
            "--model_id", "a1", "--training_mode", "alignment",
            "--hidden_dim", "16", "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "2", "--num_epochs", "3", "--lr", "0.02",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
            "--node_embed_norm", "l2",
        ])
        log = (tmp_path / "output" / "a1" / "train.log").read_text()
        losses = [
            float(line.split(":", 1)[1])
            for line in log.splitlines()
            if line.startswith("Training Loss:")
        ]
        assert len(losses) >= 3
        assert losses[-1] < losses[0], losses

    def test_fit_node_stats_flag(self, triplet_tsv, tmp_path, monkeypatch):
        """--fit-node-stats exports fitted (non-init) zscore buffers."""
        import torch

        from ginfinity_tpu.training.train_cli import main

        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", triplet_tsv, "--model_id", "fns",
            "--training_mode", "triplet", "--hidden_dim", "16",
            "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "8", "--num_epochs", "1", "--lr", "0.01",
            "--decay_rate", "0.9", "--val_fraction", "0.25",
            "--node_embed_norm", "zscore_l2", "--fit-node-stats",
        ])
        sd = torch.load(
            str(tmp_path / "output" / "fns" / "fns.pth"), weights_only=False
        )["state_dict"]
        assert not torch.allclose(sd["node_mu"], torch.zeros_like(sd["node_mu"]))
        assert not torch.allclose(sd["node_sigma"], torch.ones_like(sd["node_sigma"]))

    def test_interrupt_saves_best_weights(self, triplet_tsv, tmp_path, monkeypatch):
        """Ctrl-C mid-training must offer to save the best weights and
        write the .pth on 'y' (train_model.py:1228-1273)."""
        import builtins

        from ginfinity_tpu.training import train_cli
        from ginfinity_tpu.training.train import EarlyStopping

        monkeypatch.chdir(tmp_path)
        calls = {"n": 0}
        orig = EarlyStopping.__call__

        def interrupting(self, val, ts):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise KeyboardInterrupt
            return orig(self, val, ts)

        monkeypatch.setattr(EarlyStopping, "__call__", interrupting)
        monkeypatch.setattr(builtins, "input", lambda *a: "y")
        train_cli.main([
            "--input_path", triplet_tsv, "--model_id", "intr",
            "--training_mode", "triplet", "--hidden_dim", "8",
            "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "50", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
        ])
        ckpt = tmp_path / "output" / "intr" / "intr.pth"
        assert ckpt.exists()
        log = (tmp_path / "output" / "intr" / "train.log").read_text()
        assert "Interrupted by user" in log
        assert "Best weights saved after interrupt: True" in log
        from ginfinity_tpu.models.checkpoint import import_torch_checkpoint

        cfg, params, state, extra = import_torch_checkpoint(str(ckpt))
        assert cfg.hidden_dims == (8,)

    def test_interrupt_decline_save(self, triplet_tsv, tmp_path, monkeypatch):
        import builtins

        from ginfinity_tpu.training import train_cli
        from ginfinity_tpu.training.train import EarlyStopping

        monkeypatch.chdir(tmp_path)

        def interrupting(self, val, ts):
            raise KeyboardInterrupt

        monkeypatch.setattr(EarlyStopping, "__call__", interrupting)
        monkeypatch.setattr(builtins, "input", lambda *a: "n")
        train_cli.main([
            "--input_path", triplet_tsv, "--model_id", "intr2",
            "--training_mode", "triplet", "--hidden_dim", "8",
            "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "50", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
        ])
        assert not (tmp_path / "output" / "intr2" / "intr2.pth").exists()
        log = (tmp_path / "output" / "intr2" / "train.log").read_text()
        assert "Best weights saved after interrupt: False" in log

    def test_diagnostic_alignment_pngs(self, triplet_tsv, tmp_path, monkeypatch):
        """--diagnostic-aligment writes epoch_NNN.png similarity matrices
        for the env-pointed dataset (train_model.py:87-310, in-process)."""
        import pandas as pd

        from ginfinity_tpu.training import train_cli

        monkeypatch.chdir(tmp_path)
        diag = tmp_path / "diag.csv"
        pd.DataFrame({
            "Name": ["a", "b"],
            "DotBracket": ["((((....))))", "((....))(...)"],
        }).to_csv(diag, index=False)
        monkeypatch.setenv("GINFINITY_DIAGNOSTIC_ALIGNMENT_PATH", str(diag))
        train_cli.main([
            "--input_path", triplet_tsv, "--model_id", "dg",
            "--training_mode", "triplet", "--hidden_dim", "8",
            "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "2", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
            "--diagnostic-aligment",
        ])
        sim_dir = tmp_path / "output" / "dg" / "similarity_matrices"
        pngs = sorted(p.name for p in sim_dir.glob("epoch_*.png"))
        assert "epoch_000.png" in pngs  # initial diagnostics always run

    def test_save_every_and_exact_resume(self, triplet_tsv, tmp_path, monkeypatch):
        """An interrupted run resumed from its latest orbax checkpoint
        must reach the SAME final weights as an uninterrupted run: the
        checkpoint carries optimizer state, jax key, numpy RNG state,
        and the early-stopping tracker."""
        import builtins

        import torch

        from ginfinity_tpu.training import train_cli
        from ginfinity_tpu.training.train import EarlyStopping

        monkeypatch.chdir(tmp_path)
        base_args = [
            "--input_path", triplet_tsv, "--training_mode", "triplet",
            "--hidden_dim", "8", "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "4", "--lr", "0.01",
            "--decay_rate", "0.9", "--val_fraction", "0.25",
            "--patience", "10", "--save-every", "1",
        ]
        # straight run
        train_cli.main(base_args + ["--model_id", "full"])

        # interrupted run: die during epoch 2's early-stopping update
        calls = {"n": 0}
        orig = EarlyStopping.__call__

        def interrupting(self, val, ts):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise KeyboardInterrupt
            return orig(self, val, ts)

        monkeypatch.setattr(EarlyStopping, "__call__", interrupting)
        monkeypatch.setattr(builtins, "input", lambda *a: "n")
        train_cli.main(base_args + ["--model_id", "part"])
        monkeypatch.setattr(EarlyStopping, "__call__", orig)

        ckpts = tmp_path / "output" / "part" / "checkpoints"
        assert ckpts.is_dir() and any(ckpts.iterdir())
        # resume and finish
        train_cli.main(base_args + ["--model_id", "part",
                                    "--resume-from", str(ckpts)])

        full = torch.load(tmp_path / "output" / "full" / "full.pth",
                          map_location="cpu", weights_only=False)
        part = torch.load(tmp_path / "output" / "part" / "part.pth",
                          map_location="cpu", weights_only=False)
        assert full["epoch"] == part["epoch"]
        for k, v in full["state_dict"].items():
            np.testing.assert_allclose(
                v.numpy(), part["state_dict"][k].numpy(), atol=1e-6,
                err_msg=k,
            )

    def test_schedule_mode(self, alignment_data, tmp_path, monkeypatch):
        from ginfinity_tpu.training.train_cli import main

        data_p, map_p = alignment_data
        monkeypatch.chdir(tmp_path)
        schedule = [
            {"round": 1, "input": data_p, "alignment_map": map_p, "patience": 3,
             "epochs": 1, "learning_rate": 0.01, "decay_rate": 0.95, "keep_weights": True},
            {"round": 2, "input": data_p, "alignment_map": map_p, "patience": 3,
             "epochs": 1, "learning_rate": 0.005, "decay_rate": 0.95, "keep_weights": True},
        ]
        sp = tmp_path / "sched.json"
        sp.write_text(json.dumps(schedule))
        main([
            "--schedule", str(sp), "--model_id", "s1",
            "--training_mode", "alignment",
            "--hidden_dim", "16", "--gin_layers", "2", "--output_dim", "8",
            "--batch_size", "2", "--num_epochs", "99", "--val_fraction", "0.25",
        ])
        assert (tmp_path / "output" / "s1" / "round_01" / "s1_round_01.pth").exists()
        assert (tmp_path / "output" / "s1" / "round_02" / "s1_round_02.pth").exists()


class TestForgiTraining:
    def test_triplet_forgi_end_to_end(self, triplet_tsv, tmp_path, monkeypatch):
        """Training with the forgi encoding must run end-to-end and export
        a checkpoint whose metadata records the encoding (16/7 feature
        dims, gin_model.py:55 rules)."""
        from ginfinity_tpu.models.checkpoint import import_torch_checkpoint
        from ginfinity_tpu.training.train_cli import main

        monkeypatch.chdir(tmp_path)
        main([
            "--input_path", triplet_tsv, "--model_id", "fg",
            "--training_mode", "triplet", "--graph_encoding", "forgi",
            "--hidden_dim", "8", "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "1", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
        ])
        cfg, params, state, _ = import_torch_checkpoint(
            str(tmp_path / "output" / "fg" / "fg.pth")
        )
        assert cfg.graph_encoding == "forgi"
        assert cfg.node_feature_dim == 16
        assert cfg.edge_feature_dim == 7


class TestSaveBestWeightsFlag:
    def test_disabled_saves_final_weights(self, triplet_tsv, tmp_path, monkeypatch):
        """--save_best_weights '' (the reference's type=bool quirk: empty
        string = False) must skip best-weight restore and the interrupt
        prompt, saving final weights instead."""
        import builtins

        from ginfinity_tpu.training import train_cli
        from ginfinity_tpu.training.train import EarlyStopping

        monkeypatch.chdir(tmp_path)

        def interrupting(self, val, ts):
            raise KeyboardInterrupt

        monkeypatch.setattr(EarlyStopping, "__call__", interrupting)
        prompted = {"n": 0}

        def fake_input(*a):
            prompted["n"] += 1
            return "y"

        monkeypatch.setattr(builtins, "input", fake_input)
        train_cli.main([
            "--input_path", triplet_tsv, "--model_id", "nb",
            "--training_mode", "triplet", "--hidden_dim", "8",
            "--gin_layers", "1", "--output_dim", "4",
            "--batch_size", "8", "--num_epochs", "3", "--lr", "0.01",
            "--decay_rate", "1.0", "--val_fraction", "0.25",
            "--save_best_weights", "",
        ])
        assert prompted["n"] == 0  # no interactive prompt without best weights
        assert not (tmp_path / "output" / "nb" / "nb.pth").exists()
        log = (tmp_path / "output" / "nb" / "train.log").read_text()
        assert "Interrupted by user" in log
