"""End-to-end pipeline tests: embed CLI, distances CLI, windows pipeline
(window semantics checked against the reference's generate_slices run
read-only with stubs)."""

import os

import numpy as np
import pandas as pd
import pytest

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"
SAMPLE = "/root/reference/example_data/sample_dataset.csv"


@pytest.fixture(scope="module")
def mini_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "mini.csv"
    pd.read_csv(SAMPLE).head(8).to_csv(p, index=False)
    return str(p)


@pytest.fixture(scope="module")
def emb_tsv(tmp_path_factory, mini_csv):
    out = str(tmp_path_factory.mktemp("out") / "emb.tsv")
    from ginfinity_tpu.pipelines.embed import main

    main([
        "--input", mini_csv,
        "--output", out,
        "--model-path", CKPT,
        "--id-column", "rnacentral_id",
        "--quiet",
    ])
    return out


class TestEmbedCLI:
    def test_output_schema(self, emb_tsv):
        df = pd.read_csv(emb_tsv, sep="\t")
        assert len(df) == 8
        assert df.columns[0] == "rnacentral_id"
        assert "embedding_vector" in df.columns
        vecs = [np.array(s.split(","), dtype=np.float32) for s in df["embedding_vector"]]
        assert all(v.shape == (128,) for v in vecs)
        assert all(np.isfinite(v).all() for v in vecs)
        # %.6f fixed-point serialization like the reference
        assert all(len(tok.split(".")[-1]) == 6 for tok in df["embedding_vector"][0].split(","))

    def test_log_written(self, emb_tsv):
        assert os.path.exists(emb_tsv.replace(".tsv", ".log"))

    def test_invalid_rows_skipped(self, tmp_path):
        df = pd.DataFrame(
            {
                "id": ["a", "b", "c"],
                "secondary_structure": ["((..))", "((..", "...."],
            }
        )
        inp = str(tmp_path / "in.csv")
        out = str(tmp_path / "out.tsv")
        df.to_csv(inp, index=False)
        from ginfinity_tpu.pipelines.embed import main

        main(["--input", inp, "--output", out, "--model-path", CKPT,
              "--id-column", "id", "--quiet"])
        res = pd.read_csv(out, sep="\t")
        assert list(res["id"]) == ["a", "c"]

    def test_all_invalid_writes_header_only(self, tmp_path):
        """Zero valid structures must still write the promised output
        file (header-only), not silently skip it."""
        df = pd.DataFrame({"id": ["a"], "secondary_structure": ["((.."]})
        inp = str(tmp_path / "in.csv")
        out = str(tmp_path / "out.tsv")
        df.to_csv(inp, index=False)
        from ginfinity_tpu.pipelines.embed import main

        main(["--input", inp, "--output", out, "--model-path", CKPT,
              "--id-column", "id", "--quiet"])
        res = pd.read_csv(out, sep="\t")
        assert len(res) == 0 and "embedding_vector" in res.columns

    def test_fused_no_windows_writes_header_only(self, tmp_path):
        """--window-size longer than every structure: header-only TSV
        with the documented columns (was a headerless empty file)."""
        df = pd.DataFrame({"id": ["a"], "secondary_structure": ["((..))"]})
        inp = str(tmp_path / "in.csv")
        out = str(tmp_path / "out.tsv")
        df.to_csv(inp, index=False)
        from ginfinity_tpu.pipelines.embed import main

        main(["--input", inp, "--output", out, "--model-path", CKPT,
              "--id-column", "id", "--quiet", "--window-size", "200"])
        res = pd.read_csv(out, sep="\t")
        assert len(res) == 0
        assert list(res.columns[:2]) == ["window_id", "id"]

    def test_wire_f16_requires_window_size(self, tmp_path):
        """--wire f16 is the D2H encoding of the fused window download;
        without --window-size it must error, not silently deliver the
        full-size download (ADVICE r4)."""
        from ginfinity_tpu.pipelines.embed import main

        with pytest.raises(SystemExit, match="window-size"):
            main(["--input", "x.csv", "--output", str(tmp_path / "o.tsv"),
                  "--model-path", CKPT, "--id-column", "id",
                  "--wire", "f16", "--quiet"])

    def test_bf16_auto_enables_f16_wire(self, tmp_path, monkeypatch):
        """--precision bf16 + --window-size auto-enables the f16 result
        wire (the user opted into lossy compute, whose ~2^-8 step
        dominates the wire's <=2^-11); explicit --wire f32 forces the
        exact download; plain f32 precision keeps the f32 wire."""
        import ginfinity_tpu.pipelines.embed as embed_mod

        df = pd.DataFrame({"id": ["a"], "secondary_structure": ["((..))."]})
        inp = str(tmp_path / "in.csv")
        df.to_csv(inp, index=False)
        seen = {}
        real = embed_mod.generate_window_embeddings

        def spy(**kw):
            seen["wire"] = kw.get("wire")
            return real(**kw)

        monkeypatch.setattr(embed_mod, "generate_window_embeddings", spy)
        base = ["--input", inp, "--model-path", CKPT, "--id-column", "id",
                "--quiet", "--window-size", "4"]
        embed_mod.main(base + ["--output", str(tmp_path / "o1.tsv"),
                               "--precision", "bf16"])
        assert seen["wire"] == "f16"
        embed_mod.main(base + ["--output", str(tmp_path / "o2.tsv"),
                               "--precision", "bf16", "--wire", "f32"])
        assert seen["wire"] is None
        embed_mod.main(base + ["--output", str(tmp_path / "o3.tsv")])
        assert seen["wire"] is None

    def test_graph_pt_requires_meta_tsv(self, tmp_path):
        from ginfinity_tpu.pipelines.embed import main

        with pytest.raises(SystemExit, match="meta-tsv"):
            main(["--graph-pt", str(tmp_path / "g.npz"),
                  "--output", str(tmp_path / "o.tsv"),
                  "--id-column", "id",
                  "--model-path", CKPT, "--quiet"])


class TestDistancesCLI:
    def test_all_pairs(self, emb_tsv, tmp_path):
        from ginfinity_tpu.pipelines.distances import main

        out = str(tmp_path / "d.tsv")
        main(["--input", emb_tsv, "--output", out, "--id-column", "rnacentral_id"])
        d = pd.read_csv(out, sep="\t")
        assert len(d) == 8 * 7 // 2
        assert set(d.columns) == {"rnacentral_id_1", "rnacentral_id_2", "distance"}
        # cross-check one pair by hand
        emb = pd.read_csv(emb_tsv, sep="\t")
        v = [np.array(s.split(","), dtype=np.float32) for s in emb["embedding_vector"]]
        expect = float(np.sum((v[0] - v[1]) ** 2))
        got = float(d.iloc[0]["distance"])
        assert abs(expect - got) < 1e-4

    def test_query_mode(self, emb_tsv, tmp_path):
        from ginfinity_tpu.pipelines.distances import main

        emb = pd.read_csv(emb_tsv, sep="\t")
        q = emb["rnacentral_id"][0]
        out = str(tmp_path / "q.tsv")
        main(["--input", emb_tsv, "--output", out, "--id-column", "rnacentral_id",
              "--mode", "2", "--query", str(q)])
        d = pd.read_csv(out, sep="\t")
        assert len(d) == 7
        assert (d["rnacentral_id_1"] == q).all()


class TestWindows:
    def test_windows_match_reference_slices(self, reference_utils, sample_structures):
        """Node sets and edge sets of every window must match the
        reference's generate_slices + adjacency cleanup."""
        import sys

        sys.path.insert(0, "/root/reference/src")
        from ginfinity.scripts.generate_windows import generate_slices

        from ginfinity_tpu.pipelines.windows import structure_to_windows

        L = 12
        for seq, s in sample_structures[:6]:
            G = reference_utils.dotbracket_to_graph(s)
            ref_slices = generate_slices(G, L, keep_paired_neighbors=True)
            ours = structure_to_windows(s, L, keep_paired_neighbors=True)
            assert len(ref_slices) == len(ours)
            for (rs, H), (os_, g) in zip(ref_slices, ours):
                assert rs == os_
                ref_nodes = sorted(H.nodes())
                assert g.n_nodes == len(ref_nodes)
                relabel = {n: k for k, n in enumerate(ref_nodes)}
                ref_edges = set()
                for u, v, d in H.edges(data=True):
                    a, b = relabel[u], relabel[v]
                    t = d.get("edge_type")
                    ref_edges.add((min(a, b), max(a, b), t))
                our_edges = set()
                for k in range(g.n_edges):
                    a, b = int(g.edge_src[k]), int(g.edge_dst[k])
                    t = "adjacent" if g.edge_attr[k, 0] > 0 else "base_pair"
                    our_edges.add((min(a, b), max(a, b), t))
                assert ref_edges == our_edges, (s, rs)

    def test_mask_threshold(self):
        from ginfinity_tpu.pipelines.windows import window_starts_mask

        # all-dots window has 0 paired fraction
        m = window_starts_mask("....((((....))))", 4, 0.3)
        assert not m[0]
        assert m[4]

    def test_cli_roundtrip(self, tmp_path, mini_csv):
        from ginfinity_tpu.pipelines.windows import load_windows_graphs, main

        outdir = str(tmp_path / "w")
        main(["--input", mini_csv, "--output-dir", outdir, "--id-column",
              "rnacentral_id", "--L", "40", "--keep-paired-neighbors",
              "--mask-threshold", "0.2", "--quiet"])
        meta = pd.read_csv(os.path.join(outdir, "windows_metadata.tsv"), sep="\t")
        graphs = load_windows_graphs(os.path.join(outdir, "windows_graphs.npz"))
        assert len(meta) == len(graphs) > 0
        assert set(meta["window_id"]) == set(graphs)

    def test_graph_pt_data_parallel_matches_single_device(self, tmp_path,
                                                          mini_csv):
        """--graph-pt mode must honor --data-parallel (the mesh used to
        be built after that branch returned): embeddings over the
        8-device mesh equal the single-device run row for row."""
        from ginfinity_tpu.pipelines.embed import main as embed_main
        from ginfinity_tpu.pipelines.windows import main as windows_main

        outdir = str(tmp_path / "w")
        windows_main(["--input", mini_csv, "--output-dir", outdir,
                      "--id-column", "rnacentral_id", "--L", "40",
                      "--keep-paired-neighbors", "--quiet"])
        npz = os.path.join(outdir, "windows_graphs.npz")
        meta = os.path.join(outdir, "windows_metadata.tsv")

        def run(tag, extra):
            out = str(tmp_path / f"{tag}.tsv")
            embed_main(["--graph-pt", npz, "--meta-tsv", meta,
                        "--output", out, "--model-path", CKPT,
                        "--id-column", "rnacentral_id", "--quiet", *extra])
            return pd.read_csv(out, sep="\t")

        single = run("single", [])
        sharded = run("sharded", ["--data-parallel"])
        assert list(single["window_id"]) == list(sharded["window_id"])
        assert list(single["embedding_vector"]) == list(
            sharded["embedding_vector"]
        )

    def test_cli_pt_format_roundtrip(self, tmp_path, mini_csv):
        """--format pt writes a reference-layout windows_graphs.pt whose
        pickle references the real torch_geometric class paths
        (generate_windows.py:171 contract); loading it back through the
        pyg_compat stubs reproduces the npz arrays exactly."""
        from ginfinity_tpu.pipelines.windows import load_windows_graphs, main

        outdir = str(tmp_path / "wpt")
        main(["--input", mini_csv, "--output-dir", outdir, "--id-column",
              "rnacentral_id", "--L", "40", "--keep-paired-neighbors",
              "--format", "both", "--quiet"])
        with open(os.path.join(outdir, "windows_graphs.pt"), "rb") as f:
            blob = f.read()
        assert b"torch_geometric.data.data" in blob  # pickled under PyG paths
        assert b"ginfinity_tpu" not in blob          # nothing package-local
        a = load_windows_graphs(os.path.join(outdir, "windows_graphs.npz"))
        b = load_windows_graphs(os.path.join(outdir, "windows_graphs.pt"))
        assert set(a) == set(b) and len(a) > 0
        for wid in a:
            np.testing.assert_array_equal(a[wid].node_feat, b[wid].node_feat)
            np.testing.assert_array_equal(a[wid].edge_src, b[wid].edge_src)
            np.testing.assert_array_equal(a[wid].edge_dst, b[wid].edge_dst)
            np.testing.assert_array_equal(a[wid].edge_attr, b[wid].edge_attr)
            assert a[wid].n_base_nodes == b[wid].n_base_nodes

    def test_foreign_pt_mask_fallbacks(self, tmp_path):
        """Foreign windows_graphs.pt archives without our exact
        ``num_base_nodes`` attribute must still filter base nodes
        correctly, via the reference's fallback ladder
        (generate_node_embeddings.py:132-182): base_node_mask attr ->
        num_base_nodes prefix -> forgi feature-indicator heuristic ->
        all nodes."""
        import torch

        from ginfinity_tpu.graphs.pyg_compat import Data, ensure_pyg
        from ginfinity_tpu.pipelines.windows import load_windows_graphs

        ensure_pyg(force_stubs=True)
        fdim = 16  # forgi layout: 8 base/seq + is_base + 7 forgi types
        is_base_col = fdim - 7 - 1

        def forgi_x(n, base_rows):
            x = np.zeros((n, fdim), np.float32)
            x[base_rows, is_base_col] = 1.0
            return torch.from_numpy(x)

        ei = torch.tensor([[0, 1, 2], [1, 2, 3]])
        ea = torch.zeros((3, 7))

        # (a) explicit non-prefix base_node_mask: nodes 0,2,3 are bases
        d_mask = Data(x=forgi_x(4, [0, 2, 3]), edge_index=ei, edge_attr=ea)
        d_mask.base_node_mask = torch.tensor([True, False, True, True])
        # (b) no mask attrs at all -> feature-indicator heuristic
        d_feat = Data(x=forgi_x(4, [0, 1]), edge_index=ei, edge_attr=ea)
        # (c) standard 4-dim features, no attrs -> all nodes are bases
        d_std = Data(
            x=torch.zeros((4, 4)), edge_index=ei, edge_attr=torch.zeros((3, 4))
        )
        path = str(tmp_path / "foreign.pt")
        torch.save({"a": d_mask, "b": d_feat, "c": d_std}, path)

        g = load_windows_graphs(path)
        assert g["a"].n_base_nodes == 3
        # non-prefix mask: nodes reordered base-first (orig 0,2,3 then 1),
        # edges remapped to the new ids
        assert g["a"].node_feat[:3, is_base_col].all()
        assert g["a"].node_feat[3, is_base_col] == 0.0
        orig_edges = {(0, 1), (1, 2), (2, 3)}
        perm = {0: 0, 2: 1, 3: 2, 1: 3}  # old id -> new id
        remapped = {(perm[s], perm[d]) for s, d in orig_edges}
        got = set(zip(g["a"].edge_src.tolist(), g["a"].edge_dst.tolist()))
        assert got == remapped
        assert g["b"].n_base_nodes == 2
        assert g["c"].n_base_nodes == 4

    def test_embed_from_windows(self, tmp_path, mini_csv):
        from ginfinity_tpu.pipelines.embed import main as embed_main
        from ginfinity_tpu.pipelines.windows import main as win_main

        outdir = str(tmp_path / "w2")
        win_main(["--input", mini_csv, "--output-dir", outdir, "--id-column",
                  "rnacentral_id", "--L", "80", "--quiet"])
        out = str(tmp_path / "wemb.tsv")
        embed_main([
            "--graph-pt", os.path.join(outdir, "windows_graphs.npz"),
            "--meta-tsv", os.path.join(outdir, "windows_metadata.tsv"),
            "--output", out, "--model-path", CKPT,
            "--id-column", "rnacentral_id", "--quiet",
        ])
        df = pd.read_csv(out, sep="\t")
        assert df.columns[0] == "window_id"
        assert len(df) > 0


class TestDistancesTopK:
    def test_topk_matches_all_pairs(self, tmp_path):
        """--top-k must agree with sorting the all-pairs output."""
        from ginfinity_tpu.pipelines.distances import main

        rng = np.random.default_rng(4)
        n, d, k = 30, 8, 3
        emb = rng.normal(size=(n, d)).astype(np.float32)
        df = pd.DataFrame({
            "rid": [f"r{i}" for i in range(n)],
            "embedding_vector": [",".join(f"{x:.6f}" for x in e) for e in emb],
        })
        inp = tmp_path / "emb.tsv"
        df.to_csv(inp, sep="\t", index=False)

        allp = tmp_path / "all.tsv"
        main(["--input", str(inp), "--output", str(allp), "--id-column", "rid"])
        topk = tmp_path / "topk.tsv"
        main(["--input", str(inp), "--output", str(topk), "--id-column", "rid",
              "--top-k", str(k)])

        a = pd.read_csv(allp, sep="\t")
        t = pd.read_csv(topk, sep="\t")
        assert len(t) == n * k
        # symmetrize the all-pairs table, then check each row's k nearest
        both = pd.concat([
            a,
            a.rename(columns={"rid_1": "rid_2", "rid_2": "rid_1"}),
        ])
        for rid, grp in t.groupby("rid_1"):
            want = set(
                both[both["rid_1"] == rid].nsmallest(k, "distance")["rid_2"]
            )
            assert set(grp["rid_2"]) == want, rid
            assert (grp["distance"].values >= 0).all()

    def test_topk_query_mode(self, tmp_path):
        from ginfinity_tpu.pipelines.distances import main

        rng = np.random.default_rng(5)
        emb = rng.normal(size=(12, 4)).astype(np.float32)
        df = pd.DataFrame({
            "rid": [f"r{i}" for i in range(12)],
            "embedding_vector": [",".join(f"{x:.6f}" for x in e) for e in emb],
        })
        inp = tmp_path / "emb.tsv"
        df.to_csv(inp, sep="\t", index=False)
        out = tmp_path / "o.tsv"
        main(["--input", str(inp), "--output", str(out), "--id-column", "rid",
              "--mode", "2", "--query", "r3", "--top-k", "4"])
        t = pd.read_csv(out, sep="\t")
        assert len(t) == 4
        assert (t["rid_1"] == "r3").all()
        assert "r3" not in set(t["rid_2"])
        assert t["distance"].is_monotonic_increasing


class TestWindowsEdgeCases:
    def test_no_structure_long_enough(self, tmp_path):
        """L larger than every structure must yield empty (header-only)
        outputs, not a crash."""
        from ginfinity_tpu.pipelines.windows import load_windows_graphs, main

        inp = tmp_path / "short.csv"
        pd.DataFrame({"rid": ["s"], "secondary_structure": ["((..))"]}).to_csv(
            inp, index=False
        )
        outdir = tmp_path / "wd"
        main(["--input", str(inp), "--output-dir", str(outdir),
              "--id-column", "rid", "--L", "500", "--quiet"])
        meta = pd.read_csv(outdir / "windows_metadata.tsv", sep="\t")
        assert len(meta) == 0
        assert "window_id" in meta.columns
        assert load_windows_graphs(str(outdir / "windows_graphs.npz")) == {}
