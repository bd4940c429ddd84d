"""Parity tests: our vectorized graph builder vs the reference's
networkx-based builder (run read-only from /root/reference with PyG
stubbed; see conftest)."""

import numpy as np
import pytest

from ginfinity_tpu.graphs.build import build_standard
from ginfinity_tpu.graphs.dotbracket import is_valid_dot_bracket, pair_table, loop_features


class TestValidator:
    @pytest.mark.parametrize(
        "s,ok",
        [
            ("....", True),
            ("((..))", True),
            ("((..)", False),
            ("(..))", False),
            ("([{<.>}])", True),
            ("AaBb", True),
            ("Ab", False),
            ("((..[[..))..]]", True),
            ("x", False),
            ("", True),
        ],
    )
    def test_cases(self, s, ok):
        assert is_valid_dot_bracket(s) == ok

    def test_matches_reference(self, reference_utils, sample_structures):
        cases = [s for _, s in sample_structures] + ["((", "))", "A.a", "a.A", "()[]", "?"]
        for s in cases:
            assert is_valid_dot_bracket(s) == reference_utils.is_valid_dot_bracket(s), s


class TestPairTable:
    def test_simple(self):
        pt = pair_table("((..))")
        assert pt.tolist() == [5, 4, -1, -1, 1, 0]

    def test_pseudoknot(self):
        pt = pair_table("((..[[..))..]]")
        assert pt[0] == 9 and pt[4] == 13 and pt[5] == 12

    def test_invalid_raises(self):
        with pytest.raises(ValueError):
            pair_table("((")
        assert pair_table("((", strict=False) is None


class TestLoopFeatures:
    def test_matches_reference_graph(self, reference_utils, sample_structures):
        for seq, s in sample_structures:
            G = reference_utils.dotbracket_to_graph(s)
            assert G is not None
            pt = pair_table(s)
            lsn, lpn = loop_features(pt)
            for i in range(len(s)):
                nd = G.nodes[i]
                assert np.isclose(lsn[i], nd["loop_size_norm"], atol=1e-6), (s, i)
                assert np.isclose(lpn[i], nd["loop_pos_norm"], atol=1e-6), (s, i)


def _reference_tensors(reference_utils, structure, sequence, seq_weight):
    """Build (x, edge set) via the reference path for comparison."""
    G = reference_utils.dotbracket_to_graph(structure, sequence)
    data = reference_utils.graph_to_tensor(G, seq_weight=seq_weight)
    x = data.x.numpy()
    ei = data.edge_index.numpy()
    ea = data.edge_attr.numpy()
    edges = {
        (int(ei[0, k]), int(ei[1, k])): tuple(np.round(ea[k], 6)) for k in range(ei.shape[1])
    }
    return x, edges


class TestStandardBuilder:
    @pytest.mark.parametrize("seq_weight", [0.0, 0.3])
    def test_matches_reference(self, reference_utils, sample_structures, seq_weight):
        for seq, s in sample_structures:
            ga = build_standard(s, seq, seq_weight=seq_weight)
            ref_x, ref_edges = _reference_tensors(reference_utils, s, seq, seq_weight)

            assert ga.node_feat.shape == ref_x.shape, s
            np.testing.assert_allclose(ga.node_feat, ref_x, atol=1e-6)

            ours = {
                (int(ga.edge_src[k]), int(ga.edge_dst[k])): tuple(np.round(ga.edge_attr[k], 6))
                for k in range(ga.n_edges)
            }
            assert ours == ref_edges, f"edge mismatch for {s}"

    def test_legacy_feature_dim(self):
        ga = build_standard("((..))", feature_dim=3)
        assert ga.node_feat.shape[1] == 3


def _random_structures(rng, n, max_len=80):
    """Random valid dot-brackets: nested parens + noise dots + occasional
    pseudoknot bracket pairs."""
    out = []
    for _ in range(n):
        L = int(rng.integers(4, max_len))
        chars = ["."] * L
        # random nested pairs
        stack = []
        for i in range(L):
            r = rng.random()
            if r < 0.35:
                stack.append(i)
                chars[i] = "("
            elif r < 0.6 and stack:
                j = stack.pop()
                chars[i] = ")"
        for j in stack:  # unmatched opens -> dots
            chars[j] = "."
        # sprinkle one pseudoknot pair if room
        dots = [i for i, c in enumerate(chars) if c == "."]
        if len(dots) >= 2 and rng.random() < 0.5:
            a, b = sorted(rng.choice(dots, size=2, replace=False))
            chars[a], chars[b] = "[", "]"
        out.append("".join(chars))
    return out


class TestStandardBuilderFuzz:
    @pytest.mark.parametrize("seq_weight", [0.0, 0.5])
    def test_random_structures_match_reference(self, reference_utils, seq_weight):
        """Property fuzz: 60 random structures (nested pairs, dots,
        pseudoknots) — node features and edge sets must equal the
        reference builder exactly."""
        rng = np.random.default_rng(17)
        for s in _random_structures(rng, 60):
            seq = "".join(rng.choice(list("ACGU"), size=len(s)))
            ga = build_standard(s, seq, seq_weight=seq_weight)
            ref_x, ref_edges = _reference_tensors(reference_utils, s, seq, seq_weight)
            np.testing.assert_allclose(ga.node_feat, ref_x, atol=1e-6, err_msg=s)
            ours = {
                (int(ga.edge_src[k]), int(ga.edge_dst[k])): tuple(np.round(ga.edge_attr[k], 6))
                for k in range(ga.n_edges)
            }
            assert ours == ref_edges, f"edge mismatch for {s}"
