"""Device-resident library-mode progressive pool (ops/library_pool.py)
must reproduce the host scorer loop exactly: same aligned rows, same
lengths, for the same guide tree and library.

Posterior values are drawn on a 1/64 grid so host float64 accumulation
(PosteriorLibrary.score_matrix's np.bincount) and the pool's f32
scatter-adds are bit-identical — parity failures are then real
scheduling/indexing bugs, never accumulation-order noise."""

import os

import numpy as np
import pytest


def _random_library(rng, lens, k=5, coverage=1.0):
    """Random sparse slabs in the consistency engine's forward layout."""
    from ginfinity_tpu.graphs.batching import _round_capacity

    N = len(lens)
    Lcap = _round_capacity(max(lens))
    pairs = [
        (a, b) for a in range(N) for b in range(a + 1, N)
        if rng.random() < coverage
    ]
    T = len(pairs)
    vals = np.zeros((T, Lcap, k), np.float32)
    idx = np.zeros((T, Lcap, k), np.int32)
    for t, (a, b) in enumerate(pairs):
        la, lb = lens[a], lens[b]
        v = rng.integers(0, 64, size=(la, k)).astype(np.float32) / 64.0
        v *= rng.random(size=(la, k)) < 0.6          # sparse zeros
        vals[t, :la] = v
        idx[t, :la] = rng.integers(0, lb, size=(la, k))
    return pairs, vals, idx, Lcap


def _family(rng, n=7, lo=15, hi=30, dim=8):
    from ginfinity_tpu.pipelines.msa import SequenceRecord, initial_profiles

    recs = []
    for i in range(n):
        L = int(rng.integers(lo, hi + 1))
        emb = rng.normal(size=(L, dim)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-8
        db = "".join(rng.choice(list("().")) for _ in range(L))
        recs.append(SequenceRecord(name=f"s{i}", emb=emb, dotbracket=db))
    return initial_profiles(recs)


def _tree(rng, n):
    from ginfinity_tpu.pipelines.msa import build_guide_tree

    D = rng.random((n, n)).astype(np.float32)
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0.0)
    return build_guide_tree(D, method="nj")


def _align(profiles, tree, library, scorer, pool: bool, go=0.0, ge=0.0):
    from ginfinity_tpu.pipelines.msa import msa_from_tree

    os.environ["GINFINITY_MSA_POOL"] = "1" if pool else "0"
    try:
        return msa_from_tree(
            tree, profiles, go, ge, scorer=scorer,
            library=library if pool else None,
        )
    finally:
        os.environ.pop("GINFINITY_MSA_POOL", None)


def _assert_profiles_equal(a, b):
    assert sorted(a.member_indices) == sorted(b.member_indices)
    assert len(a.stem) == len(b.stem), "column counts differ"
    for m in a.member_indices:
        assert bytes(a.aligned_chars[m]) == bytes(b.aligned_chars[m]), m


class TestLibraryPoolParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_host_scorer_loop(self, seed):
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(seed)
        profiles = _family(rng)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))

        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        pool = _align(profiles, tree, dev_lib, dev_lib.score_matrix, pool=True)
        _assert_profiles_equal(host, pool)

    def test_scan_tail_matches_host_scorer_loop(self):
        """A left-deep chain tree is ALL batch-1 levels: the unified
        _lib_tail_wide scan runs them one lane per step across more
        than one _POOL_SCAN_CHUNK submission (one full group plus a
        padded remainder) and must still reproduce the host scorer
        loop byte-for-byte.

        The library is built diagonal-dominant (each position's top
        partner is its own index) so chained merges stay near the leaf
        length and the pool CANNOT overflow — _msa_from_tree_pool_library
        returning a Profile (not None) is asserted, otherwise a silent
        host fallback would pass this test without ever validating the
        scan program's results."""
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.ops.library_pool import _POOL_SCAN_CHUNK
        from ginfinity_tpu.pipelines.msa import (
            PosteriorLibrary,
            _msa_from_tree_pool_library,
            msa_from_tree,
        )

        rng = np.random.default_rng(61)
        n = _POOL_SCAN_CHUNK + 5        # forces a padded second group
        profiles = _family(rng, n=n, lo=16, hi=20)
        lens = [p.mu_struct.shape[0] for p in profiles]
        # diagonal-dominant sparse slabs on the 1/64 grid (see module
        # docstring): strong own-index match + weak random alternatives
        k = 4
        Lcap = _round_capacity(max(lens))
        pairs = [(a, b) for a in range(n) for b in range(a + 1, n)
                 if rng.random() < 0.5]
        T = len(pairs)
        vals = np.zeros((T, Lcap, k), np.float32)
        idx = np.zeros((T, Lcap, k), np.int32)
        for t, (a, b) in enumerate(pairs):
            la, lb = lens[a], lens[b]
            vals[t, :la, 0] = 48 / 64.0
            idx[t, :la, 0] = np.minimum(np.arange(la), lb - 1)
            vals[t, :la, 1:] = (
                rng.integers(0, 8, size=(la, k - 1)) / 64.0)
            idx[t, :la, 1:] = rng.integers(0, lb, size=(la, k - 1))
        tree = 0
        for t in range(1, n):
            tree = (tree, t)
        internals = []

        def walk(node):
            if isinstance(node, int):
                return
            walk(node[0])
            walk(node[1])
            internals.append(node)

        walk(tree)
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = msa_from_tree(tree, profiles, -0.25, -0.125,
                             scorer=host_lib.score_matrix)
        pool = _msa_from_tree_pool_library(
            tree, internals, profiles, dev_lib, -0.25, -0.125)
        assert pool is not None, "pool overflowed — scan path not tested"
        _assert_profiles_equal(host, pool)

    def test_nonzero_gap_costs(self):
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(7)
        profiles = _family(rng, n=6)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix,
                      pool=False, go=-0.25, ge=-0.125)
        pool = _align(profiles, tree, dev_lib, dev_lib.score_matrix,
                      pool=True, go=-0.25, ge=-0.125)
        _assert_profiles_equal(host, pool)

    def test_sparse_pair_coverage(self):
        """kNN-capped libraries leave many merges with zero spanning
        pairs (all-zero score matrices) — both paths must agree."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(11)
        profiles = _family(rng, n=8)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens, coverage=0.3)
        if not pairs:
            pytest.skip("empty library draw")
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        pool = _align(profiles, tree, dev_lib, dev_lib.score_matrix, pool=True)
        _assert_profiles_equal(host, pool)

    def test_entry_chunking(self, monkeypatch):
        """Levels with more spanning pairs than one accumulation chunk
        must split across _lib_accum calls without changing the result."""
        import jax.numpy as jnp

        from ginfinity_tpu.ops import library_pool
        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        monkeypatch.setattr(library_pool, "_ENTRY_CHUNK", 2)
        rng = np.random.default_rng(13)
        profiles = _family(rng, n=7)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        pool = _align(profiles, tree, dev_lib, dev_lib.score_matrix, pool=True)
        _assert_profiles_equal(host, pool)

    def test_lazy_download_not_triggered_by_pool(self):
        """The pool path must never materialize the host slab copy."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(17)
        profiles = _family(rng, n=5)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        _align(profiles, tree, dev_lib, dev_lib.score_matrix, pool=True)
        assert dev_lib._by_pair is None and dev_lib._vals is None

class TestLibraryPrewarm:
    def test_prewarm_compiles_program_set(self, capsys, monkeypatch):
        """prewarm_library_programs must run its whole program set
        without error — the timing line only prints after every width
        compiled (the worker swallows exceptions, so the print is the
        success signal)."""
        from ginfinity_tpu.ops.library_pool import prewarm_library_programs

        monkeypatch.setenv("GINFINITY_MSA_TIMING", "1")
        th = prewarm_library_programs(
            n_seq=6, P=64, n_pairs=15, Ls=32, K=5, b_max=3, refine_len=40
        )
        th.join(timeout=300)
        assert not th.is_alive()
        assert "[prewarm] library-pool programs" in capsys.readouterr().out


class TestDeviceScoreMatrix:
    """PosteriorLibrary._score_matrix_device (the single-merge device
    scorer used by iterative refinement and the pool-overflow fallback)
    must reproduce the host np.bincount loop."""

    def test_every_merge_scored_on_device_matches_host(self):
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(29)
        profiles = _family(rng)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        # scorer given + library=None routes EVERY merge through
        # scorer(a, b) with the device scatter enabled (no env override)
        from ginfinity_tpu.pipelines.msa import msa_from_tree

        dev = msa_from_tree(tree, profiles, 0.0, 0.0,
                            scorer=dev_lib.score_matrix)
        _assert_profiles_equal(host, dev)
        # and the device scorer must never download the slabs
        assert dev_lib._vals is None and dev_lib._by_pair is None

    def test_pool_env_forces_host_scorer(self, monkeypatch):
        """GINFINITY_MSA_POOL=0 must route score_matrix to the host
        loop even with device slabs resident — the knob exists to
        cross-check the device scatter against an independent path."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(47)
        profiles = _family(rng, n=3, lo=11, hi=15)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens, k=3)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        monkeypatch.setenv("GINFINITY_MSA_POOL", "0")
        dev_lib.score_matrix(profiles[0], profiles[1])
        assert dev_lib._vals is not None  # host loop ran (lazy download)
        assert dev_lib.merge_ops(profiles[0], profiles[1], 0.0, 0.0) is None

    def test_matrix_values_match_host(self):
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import (
            PosteriorLibrary, merge_profiles,
        )

        rng = np.random.default_rng(31)
        profiles = _family(rng, n=4)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        A = merge_profiles(profiles[0], profiles[1], -0.5, -0.1)
        B = merge_profiles(profiles[2], profiles[3], -0.5, -0.1)
        Sh = host_lib._score_matrix_host(A, B)
        Sd = dev_lib._score_matrix_device(A, B)
        assert Sd.shape == Sh.shape
        np.testing.assert_allclose(Sd, Sh, atol=1e-6)

    def test_merge_ops_fused_matches_host_scorer_plus_dp(self):
        """PosteriorLibrary.merge_ops (device-fused score+DP, op codes
        only over the link) must yield the same op sequence as the host
        scorer + profile_align_batch_ops round trip."""
        import jax.numpy as jnp

        from ginfinity_tpu.ops.pairhmm import profile_align_batch_ops
        from ginfinity_tpu.pipelines.msa import (
            PosteriorLibrary, merge_profiles,
        )

        rng = np.random.default_rng(37)
        profiles = _family(rng, n=4)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        A = merge_profiles(profiles[0], profiles[1], -0.5, -0.1)
        B = merge_profiles(profiles[2], profiles[3], -0.5, -0.1)
        for go, ge in [(0.0, 0.0), (-0.25, -0.125)]:
            want = profile_align_batch_ops(
                [host_lib._score_matrix_host(A, B)], go, ge
            )[0]
            got = dev_lib.merge_ops(A, B, go, ge)
            np.testing.assert_array_equal(got, want)
        assert host_lib.merge_ops(A, B, 0.0, 0.0) is None  # no slabs

    def test_overflow_fallback_fused_level_matches_host(self, monkeypatch):
        """When the level pool overflows (run_library_pool -> None), the
        fallback loop must take the fused LEVEL path — batched scatter +
        DP, zero score-matrix round trips, scorer never called — and
        still reproduce the host scorer loop."""
        import jax.numpy as jnp

        from ginfinity_tpu.ops import library_pool
        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        monkeypatch.setattr(
            library_pool, "run_library_pool", lambda *a, **k: None
        )
        rng = np.random.default_rng(43)
        profiles = _family(rng)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        scorer_calls = []

        def counting_scorer(A, B):
            scorer_calls.append(1)
            return dev_lib.score_matrix(A, B)

        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        fused = _align(profiles, tree, dev_lib, counting_scorer, pool=True)
        _assert_profiles_equal(host, fused)
        assert not scorer_calls, "fused level path must bypass the scorer"
        assert dev_lib._vals is None and dev_lib._by_pair is None

    def test_refinement_fused_matches_host(self):
        """iterative_refinement with the fused merge_ops path must
        produce the same accepted alignments as the host scorer path."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import (
            PosteriorLibrary, iterative_refinement,
        )

        rng = np.random.default_rng(41)
        profiles = _family(rng)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        aln = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        host_ref, host_stats = iterative_refinement(
            aln, profiles, 4, np.random.default_rng(3), 0.0, 0.0,
            scorer=host_lib.score_matrix,
        )
        dev_ref, dev_stats = iterative_refinement(
            aln, profiles, 4, np.random.default_rng(3), 0.0, 0.0,
            scorer=dev_lib.score_matrix, merge_ops_fn=dev_lib.merge_ops,
        )
        assert host_stats == dev_stats
        _assert_profiles_equal(host_ref, dev_ref)
        assert dev_lib._vals is None and dev_lib._by_pair is None

    def test_wide_family_pool_matches_host(self):
        """Scale smoke beyond the small parity draws: 24 sequences give
        wide early levels (Bmax > 2), multi-chunk entry scatters and a
        long caterpillar tail — the pool must still reproduce the host
        scorer loop byte-for-byte."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import PosteriorLibrary

        rng = np.random.default_rng(53)
        profiles = _family(rng, n=24, lo=20, hi=34)
        lens = [p.mu_struct.shape[0] for p in profiles]
        pairs, vals, idx, _ = _random_library(rng, lens, coverage=0.5)
        tree = _tree(rng, len(profiles))
        host_lib = PosteriorLibrary(pairs, vals, idx, lens)
        dev_lib = PosteriorLibrary(
            pairs, None, None, lens,
            device_slabs=(jnp.asarray(vals), jnp.asarray(idx)),
        )
        host = _align(profiles, tree, None, host_lib.score_matrix, pool=False)
        pool = _align(profiles, tree, dev_lib, dev_lib.score_matrix, pool=True)
        _assert_profiles_equal(host, pool)

    def test_cli_pool_matches_host(self, tmp_path):
        """Whole-pipeline check: ginfinity-embed-msa --dp-score library
        with the pool on vs GINFINITY_MSA_POOL=0 writes identical
        alignments (covers the device-slab handoff in main())."""
        import json

        import pandas as pd

        from ginfinity_tpu.pipelines.msa import main as msa_main

        rng = np.random.default_rng(23)
        base = rng.normal(size=(40, 12)).astype(np.float32)
        rows = []
        for s in range(6):
            L = int(rng.integers(32, 41))
            emb = base[:L] + 0.1 * rng.normal(size=(L, 12)).astype(np.float32)
            rows.append({"Name": f"s{s}",
                         "node_embeddings": json.dumps(emb.round(4).tolist())})
        inp = tmp_path / "fam.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)

        def run(tag, pool):
            os.environ["GINFINITY_MSA_POOL"] = "1" if pool else "0"
            try:
                msa_main(["--input", str(inp),
                          "--out-prefix", str(tmp_path / tag / "msa"),
                          "--alpha", "5", "--beta", "0",
                          "--consistency-rounds", "1",
                          "--dp-score", "library", "--refine-iters", "0"])
            finally:
                os.environ.pop("GINFINITY_MSA_POOL", None)
            return (tmp_path / tag / "msa.fasta").read_text()

        assert run("pool", True) == run("host", False)
