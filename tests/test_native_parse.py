"""Native JSON-matrix parser (native/ginfast.cpp::gf_parse_floats).

The reference serializes per-node embedding matrices as JSON text
columns (generate_node_embeddings.py:54-63); our native scanner must be
bit-identical to the json.loads -> float64 -> float32 path it replaces,
and must reject anything that is not a plain rectangular numeric matrix
(the caller then falls back to json.loads).
"""

import json

import numpy as np
import pytest

from ginfinity_tpu.utils.native import native_available, parse_float_matrix


needs_native = pytest.mark.skipif(
    not native_available(), reason="libginfast.so not built"
)


@needs_native
class TestParseFloatMatrix:
    def test_bitwise_parity_with_json(self):
        rng = np.random.default_rng(0)
        mags = rng.choice([1e-8, 1e-3, 1.0, 1e4], (57, 128))
        m = (rng.standard_normal((57, 128)) * mags).astype(np.float32)
        s = json.dumps(
            [[round(float(v), 6) for v in row] for row in m],
            separators=(",", ":"),
        )
        ref = np.array(json.loads(s), dtype=np.float32)
        fast = parse_float_matrix(s)
        assert fast is not None and fast.shape == ref.shape
        assert (fast == ref).all()  # bitwise, not allclose

    def test_scientific_notation_and_spacing(self):
        out = parse_float_matrix("[[1e-5, -2.5],\n [3, 4.0]]")
        assert out is not None
        np.testing.assert_array_equal(
            out, np.array([[1e-5, -2.5], [3.0, 4.0]], np.float32)
        )

    @pytest.mark.parametrize(
        "bad",
        [
            "[[1,2],[3]]",          # ragged
            "[[1,2],[3,4,5],[6]]",  # ragged but divisible total
            "not json",
            "",
            "[]",
            "[[]]",
            '[["a","b"]]',
            "[[1,2],[3,4]",         # unbalanced
            "[1,2,3]",              # 1-D
            "[[[1]]]",              # 3-D
            "[[1,null]]",
            "[[1,2]] trailing",
            # strtod is laxer than JSON — all of these must fall back
            # to json.loads (which rejects them) instead of silently
            # parsing to a different value
            "[[0x1A,2]]",           # hex float
            "[[-inf,1.0]]",
            "[[nan]]",
            "[[Infinity]]",
            "[[1.,2]]",             # trailing dot
            "[[+1,2]]",             # leading plus
            "[[.5,2]]",             # bare fraction
            "[[01,2]]",             # leading zero
            "[[1e,2]]",             # empty exponent
        ],
    )
    def test_rejects_malformed(self, bad):
        assert parse_float_matrix(bad) is None

    def test_non_string_cells(self):
        assert parse_float_matrix(None) is None
        assert parse_float_matrix(float("nan")) is None

    def test_pipeline_parsers_agree(self):
        from ginfinity_tpu.pipelines.msa import _parse_matrix_cell
        from ginfinity_tpu.pipelines.node_embed import (
            parse_matrix,
            serialize_matrix,
        )

        rng = np.random.default_rng(1)
        m = rng.standard_normal((33, 16)).astype(np.float32)
        s = serialize_matrix(m)
        ref = np.array(json.loads(s), dtype=np.float32)
        np.testing.assert_array_equal(parse_matrix(s), ref)
        np.testing.assert_array_equal(_parse_matrix_cell(s), ref)
        # msa cell parser falls back (to None) on malformed input
        assert _parse_matrix_cell("[[1,2],[3]]") is None


class TestNativeFallbacks:
    def test_missing_lib_silently_falls_back_to_numpy(self, monkeypatch):
        """With libginfast.so absent, dot-bracket parsing must route to
        the NumPy scan — not raise RuntimeError on every structure."""
        import importlib

        from ginfinity_tpu.graphs import dotbracket
        from ginfinity_tpu.utils import native

        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        try:
            mod = importlib.reload(dotbracket)
            assert mod._native_pair_table is None
            assert mod.is_valid_dot_bracket("(())")
            assert mod.pair_table("(())").tolist() == [3, 2, 1, 0]
            assert mod.pair_table("((", strict=False) is None
        finally:
            monkeypatch.undo()
            importlib.reload(dotbracket)

    @needs_native
    def test_non_latin1_structure_is_invalid_not_a_crash(self):
        from ginfinity_tpu.graphs.dotbracket import (
            is_valid_dot_bracket, pair_table,
        )
        from ginfinity_tpu.utils.native import native_pair_table

        assert native_pair_table("((…))") is None
        assert is_valid_dot_bracket("((…))") is False
        assert pair_table("((…))", strict=False) is None


def test_serialize_matrix_matches_reference_rounding():
    """np.round-based serialization must emit the exact string the
    reference's per-element round(float(x), 6) loop would
    (generate_node_embeddings.py:54-63 format)."""
    from ginfinity_tpu.pipelines.node_embed import serialize_matrix

    rng = np.random.default_rng(2)
    mags = rng.choice([1e-9, 1e-4, 1.0, 1e5], (41, 24))
    m = (rng.standard_normal((41, 24)) * mags).astype(np.float32)
    ref = json.dumps(
        [[round(float(x), 6) for x in row] for row in m],
        separators=(",", ":"),
    )
    assert serialize_matrix(m) == ref
