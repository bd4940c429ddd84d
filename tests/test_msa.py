"""MSA pipeline: pair-HMM sanity, profile DP parity (vs reference pure-
python kernels), and end-to-end CLI runs including dummy mode."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/reference/src")


class TestPairHMM:
    def test_posteriors_identity_signal(self):
        from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

        L = np.full((10, 10), -3.0, np.float32)
        np.fill_diagonal(L, 3.0)
        P = pairhmm_posteriors([L], -10.0, -0.5)[0]
        assert P.shape == (10, 10)
        assert P.diagonal().min() > 0.9
        assert (P - np.diag(P.diagonal())).max() < 0.1
        assert P.max() <= 1.0 + 1e-5

    def test_posteriors_batch_padding(self):
        from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors

        rng = np.random.default_rng(0)
        mats = [rng.normal(size=(5, 9)).astype(np.float32),
                rng.normal(size=(12, 4)).astype(np.float32)]
        batched = pairhmm_posteriors(mats, -4.0, -0.5)
        for m, P in zip(mats, batched):
            solo = pairhmm_posteriors([m], -4.0, -0.5)[0]
            np.testing.assert_allclose(P, solo, atol=1e-4)

    def test_device_traceback_matches_host_oracle(self):
        """The on-device value-based traceback (profile_align_batch_ops)
        must reproduce the host traceback over the dense M/X/Y exactly,
        including the M-then-X-then-Y strict-greater tie priority."""
        from ginfinity_tpu.ops.pairhmm import (
            profile_align,
            profile_align_batch_ops,
        )

        rng = np.random.default_rng(3)
        mats = [
            rng.normal(size=(la, lb)).astype(np.float32)
            for la, lb in [(6, 9), (14, 11), (10, 10), (1, 7)]
        ]
        got = profile_align_batch_ops(mats, -3.0, -0.5)
        for S, ops_dev in zip(mats, got):
            M, X, Y = profile_align(S, -3.0, -0.5)
            i, j = S.shape
            ops = []
            while i > 0 or j > 0:
                cur_state, cur_val = 0, -1e30
                if i > 0 and j > 0 and M[i, j] > cur_val:
                    cur_val, cur_state = M[i, j], 0
                if i > 0 and X[i, j] > cur_val:
                    cur_val, cur_state = X[i, j], 1
                if j > 0 and Y[i, j] > cur_val:
                    cur_val, cur_state = Y[i, j], 2
                ops.append(cur_state)
                if cur_state == 0:
                    i, j = i - 1, j - 1
                elif cur_state == 1:
                    i -= 1
                else:
                    j -= 1
            ops.reverse()
            assert list(ops_dev) == ops, (S.shape, list(ops_dev), ops)

    def test_profile_dp_matches_reference(self):
        from ginfinity.scripts.embed_msa import _affine_dp_profile

        from ginfinity_tpu.ops.pairhmm import profile_align

        rng = np.random.default_rng(1)
        for la, lb in [(4, 4), (9, 17), (21, 6)]:
            muA = rng.normal(size=(la, 8)).astype(np.float32)
            muB = rng.normal(size=(lb, 8)).astype(np.float32)
            stemA = (rng.random(la) > 0.5).astype(np.float32)
            stemB = (rng.random(lb) > 0.5).astype(np.float32)
            Mr, Xr, Yr = _affine_dp_profile(muA, muB, stemA, stemB, -2.0, -0.5)
            comp = np.where(
                (stemA[:, None] >= 0.5) == (stemB[None, :] >= 0.5), 0.2, 0.0
            ).astype(np.float32)
            M, X, Y = profile_align((muA @ muB.T + comp).astype(np.float32), -2.0, -0.5)
            for ours, ref in ((M, Mr), (X, Xr), (Y, Yr)):
                fin = ref > -1e29
                np.testing.assert_allclose(ours[fin], ref[fin], atol=1e-3)


class TestSparsify:
    def test_row_col_intersection(self):
        from ginfinity_tpu.pipelines.msa import sparsify_topk_mask

        rng = np.random.default_rng(2)
        P = rng.random((30, 25)).astype(np.float32)
        mask = sparsify_topk_mask(P, topk=5, pmin=1e-4)
        # every kept entry is in the top-5 of its row and column
        for i, j in zip(*np.nonzero(mask)):
            assert P[i, j] >= np.partition(P[i], -5)[-5] - 1e-7
            assert P[i, j] >= np.partition(P[:, j], -5)[-5] - 1e-7


def _random_sparse_posteriors(rng, lengths, topk=6, drop_pairs=()):
    """Random already-sparsified posterior dict over all (a, b) pairs."""
    from ginfinity_tpu.pipelines.msa import sparsify_topk_mask

    post = {}
    N = len(lengths)
    for a in range(N):
        for b in range(a + 1, N):
            if (a, b) in drop_pairs:
                continue
            P = rng.random((lengths[a], lengths[b])).astype(np.float32) ** 3
            keep = sparsify_topk_mask(P, topk, 1e-4)
            post[(a, b)] = np.where(keep, P, 0.0).astype(np.float32)
    return post


class TestConsistency:
    @pytest.mark.parametrize("drop", [(), ((1, 3), (0, 4))])
    def test_device_rounds_equal_dict_oracle(self, drop):
        from ginfinity_tpu.pipelines.msa import (
            consistency_round,
            run_consistency_rounds,
        )

        rng = np.random.default_rng(5)
        lengths = [7, 11, 9, 8, 12]
        post = _random_sparse_posteriors(rng, lengths, topk=4, drop_pairs=drop)
        want = dict(post)
        for _ in range(2):
            want = consistency_round(want, len(lengths), 0.5, 4, 1e-4)
        got = run_consistency_rounds(post, len(lengths), 2, 0.5, 4, 1e-4)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=2e-6, rtol=2e-5)

    @pytest.mark.parametrize("drop", [(), ((0, 2),)])
    def test_distances_device_path_equals_host(self, drop):
        from ginfinity_tpu.pipelines.msa import (
            build_distance_matrix,
            consistency_round,
            consistency_rounds_to_distances,
        )

        rng = np.random.default_rng(8)
        lengths = [6, 9, 7, 11]
        post = _random_sparse_posteriors(rng, lengths, topk=4, drop_pairs=drop)
        want = dict(post)
        for _ in range(2):
            want = consistency_round(want, len(lengths), 0.5, 4, 1e-4)
        D_want = build_distance_matrix(want, len(lengths))
        D_got = consistency_rounds_to_distances(post, len(lengths), 2, 0.5, 4, 1e-4)
        np.testing.assert_allclose(D_got, D_want, atol=1e-5)
        # zero rounds == plain distance matrix
        np.testing.assert_allclose(
            consistency_rounds_to_distances(post, len(lengths), 0),
            build_distance_matrix(post, len(lengths)),
            atol=1e-6,
        )

    def test_hbm_budget_falls_back_to_host(self):
        from ginfinity_tpu.pipelines.msa import run_consistency_rounds

        rng = np.random.default_rng(6)
        post = _random_sparse_posteriors(rng, [6, 6, 6])
        got = run_consistency_rounds(post, 3, 1, hbm_budget_bytes=16)
        assert set(got) == set(post)

    @pytest.mark.parametrize("drop", [(), ((1, 3),)])
    def test_tiled_sparse_path_equals_dict_oracle(self, drop):
        """A budget between the sparse and dense footprints selects the
        tiled [N,N,L,K] path; it must reproduce the dict transform."""
        from ginfinity_tpu.pipelines.msa import (
            _sparse_bytes,
            consistency_round,
            run_consistency_rounds,
        )

        rng = np.random.default_rng(9)
        lengths = [17, 23, 19, 21, 25, 18]
        N, Lmax = len(lengths), max(lengths)
        post = _random_sparse_posteriors(rng, lengths, topk=4, drop_pairs=drop)
        want = dict(post)
        for _ in range(2):
            want = consistency_round(want, N, 0.5, 4, 1e-4)
        budget = _sparse_bytes(len(post), Lmax, 4)
        assert budget < 2 * N * N * Lmax * Lmax * 4  # dense path excluded
        got = run_consistency_rounds(
            post, N, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(got[key], want[key], atol=2e-6, rtol=2e-5)

    def test_tiled_multi_block_equals_single_call(self, monkeypatch):
        """Bounding pairs-per-device-call (the remote-worker robustness
        split) must not change results or slot alignment."""
        import ginfinity_tpu.pipelines.msa as msa_mod

        rng = np.random.default_rng(11)
        lengths = [12] * 7  # 21 pairs
        post = _random_sparse_posteriors(rng, lengths, topk=4)
        budget = msa_mod._sparse_bytes(len(post), 12, 4)
        want = msa_mod.run_consistency_rounds(
            post, 7, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        monkeypatch.setattr(msa_mod, "_MAX_PAIRS_PER_CALL", 8)
        got = msa_mod.run_consistency_rounds(
            post, 7, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        assert set(got) == set(want)
        for key in want:
            np.testing.assert_allclose(got[key], want[key], atol=1e-6)

    def test_memoized_round_equals_tiled_round(self, monkeypatch):
        """The memoized-densification round (one [2P+1, L, L] block array
        per round instead of per-triple scatter scratch) must reproduce
        the tiled round exactly."""
        import ginfinity_tpu.pipelines.msa as msa_mod

        rng = np.random.default_rng(21)
        lengths = [14, 19, 16, 22, 17, 15, 20]
        N, Lmax = len(lengths), max(lengths)
        post = _random_sparse_posteriors(rng, lengths, topk=4)
        budget = msa_mod._sparse_bytes(len(post), Lmax, 4)
        memo = msa_mod.run_consistency_rounds(
            post, N, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        monkeypatch.setattr(msa_mod, "_MEMO_BUDGET_BYTES", 0)  # force tiled
        tiled = msa_mod.run_consistency_rounds(
            post, N, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        assert set(memo) == set(tiled)
        for key in tiled:
            np.testing.assert_allclose(memo[key], tiled[key], atol=2e-6)

    def test_from_slabs_equals_dict_path(self):
        """The device-resident entry (pairwise slabs -> consistency ->
        distances, no dict round-trip) must equal the dict-based path."""
        import jax.numpy as jnp

        from ginfinity_tpu.pipelines.msa import (
            _pack_sparse_posteriors,
            _sparse_bytes,
            consistency_rounds_to_distances,
            consistency_rounds_to_distances_from_slabs,
        )

        rng = np.random.default_rng(12)
        lengths = [15, 18, 13, 20, 16, 19]
        N, Lmax = len(lengths), max(lengths)
        post = _random_sparse_posteriors(rng, lengths, topk=4)
        budget = _sparse_bytes(len(post), Lmax, 4)
        D_want = consistency_rounds_to_distances(
            post, N, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        pairs, Cv, Ci, _ = _pack_sparse_posteriors(post, N, Lmax, 4, 8, 8)
        # emulate the pairwise stage's per-batch slab layout (batches of 4)
        kv_list, ki_list, chunks = [], [], []
        for s in range(0, len(pairs), 4):
            chunk = pairs[s : s + 4]
            kv_list.append(jnp.asarray(Cv[s : s + len(chunk)]))
            ki_list.append(jnp.asarray(Ci[s : s + len(chunk)]))
            chunks.append(chunk)
        D_got = consistency_rounds_to_distances_from_slabs(
            kv_list, ki_list, chunks, N, Lmax, 4, 2, lam=0.5, pmin=1e-4
        )
        np.testing.assert_allclose(D_got, D_want, atol=1e-6)

    def test_tiled_distances_equal_host(self):
        from ginfinity_tpu.pipelines.msa import (
            _sparse_bytes,
            build_distance_matrix,
            consistency_round,
            consistency_rounds_to_distances,
        )

        rng = np.random.default_rng(10)
        lengths = [14, 19, 16, 21, 15]
        N, Lmax = len(lengths), max(lengths)
        post = _random_sparse_posteriors(rng, lengths, topk=4)
        want = dict(post)
        for _ in range(2):
            want = consistency_round(want, N, 0.5, 4, 1e-4)
        D_want = build_distance_matrix(want, N)
        budget = _sparse_bytes(len(post), Lmax, 4)
        D_got = consistency_rounds_to_distances(
            post, N, 2, 0.5, 4, 1e-4, hbm_budget_bytes=budget
        )
        np.testing.assert_allclose(D_got, D_want, atol=1e-5)


class TestEmbeddingResidentPosteriors:
    def test_matches_host_score_path(self):
        """The device-resident posterior stage (embeddings -> scores ->
        calibration -> posteriors -> sparsify, one program) must equal
        the host score path."""
        import jax.numpy as jnp

        from ginfinity_tpu.graphs.batching import _round_capacity
        from ginfinity_tpu.ops.pairhmm import (
            _pair_posteriors_from_embs,
            pairhmm_posteriors,
        )
        from ginfinity_tpu.pipelines.msa import (
            _l2_normalize_rows,
            calibrate_log_odds,
            sparsify_topk_mask,
        )

        rng = np.random.default_rng(3)
        lengths = [14, 9, 12]
        embs_list = [
            _l2_normalize_rows(rng.normal(size=(L, 8)).astype(np.float32))
            for L in lengths
        ]
        pairs = [(0, 1), (0, 2), (1, 2)]
        alpha, beta, go, ge, topk = 5.0, 0.0, -6.0, -0.5, 4

        Lcap = _round_capacity(max(lengths))
        embs = np.zeros((3, Lcap, 8), np.float32)
        lens = np.zeros(3, np.int32)
        for i, e in enumerate(embs_list):
            embs[i, : e.shape[0]] = e
            lens[i] = e.shape[0]
        ia = np.array([p[0] for p in pairs], np.int32)
        ib = np.array([p[1] for p in pairs], np.int32)
        kv, ki, ex = _pair_posteriors_from_embs(
            jnp.asarray(embs), jnp.asarray(lens), jnp.asarray(ia), jnp.asarray(ib),
            jnp.float32(alpha), jnp.float32(beta), jnp.float32(go), jnp.float32(ge),
            jnp.float32(1e-4), False, topk,
        )
        kv, ki, ex = np.asarray(kv), np.asarray(ki), np.asarray(ex)

        for t, (a, b) in enumerate(pairs):
            S = embs_list[a] @ embs_list[b].T
            P = pairhmm_posteriors([calibrate_log_odds(S, alpha, beta)], go, ge)[0]
            keep = sparsify_topk_mask(P, topk, 1e-4)
            want = np.where(keep, P, 0.0)
            la, lb = lengths[a], lengths[b]
            got = np.zeros((la, lb), np.float32)
            rows_i = np.repeat(np.arange(la), topk)
            vals = kv[t, :la].ravel()
            cols = ki[t, :la].ravel()
            nz = vals > 0
            got[rows_i[nz], cols[nz]] = vals[nz]
            np.testing.assert_allclose(got, want, atol=1e-5)
            np.testing.assert_allclose(ex[t], (S * want).sum(), rtol=1e-4)


class TestGuideTree:
    @staticmethod
    def _oracle_tree(D, method):
        """Dict-based reference-semantics oracle (embed_msa.py:700-805),
        test-only."""
        N = D.shape[0]
        if N == 1:
            return 0
        clusters = {i: i for i in range(N)}
        sizes = {i: 1 for i in range(N)}
        dist = {(i, j): float(D[i, j]) for i in range(N) for j in range(i + 1, N)}
        next_id, active = N, set(range(N))

        def get_d(a, b):
            if a == b:
                return 0.0
            x, y = (a, b) if a < b else (b, a)
            return dist[(x, y)]

        while len(active) > (1 if method == "upgma" else 2):
            act = sorted(active)
            m = len(act)
            if method == "nj":
                rsum = {i: sum(get_d(i, k) for k in act if k != i) for i in act}
            best, best_v = None, 1e18
            for x in range(m):
                for y in range(x + 1, m):
                    a, b = act[x], act[y]
                    v = (
                        get_d(a, b)
                        if method == "upgma"
                        else (m - 2) * get_d(a, b) - rsum[a] - rsum[b]
                    )
                    if v < best_v:
                        best_v, best = v, (a, b)
            a, b = best
            u = next_id
            next_id += 1
            clusters[u] = (clusters[a], clusters[b])
            sa, sb = sizes[a], sizes[b]
            sizes[u] = sa + sb
            dab = get_d(a, b)
            for c in list(active):
                if c in (a, b):
                    continue
                dc = (
                    (get_d(a, c) * sa + get_d(b, c) * sb) / (sa + sb)
                    if method == "upgma"
                    else (get_d(a, c) + get_d(b, c) - dab) / 2.0
                )
                dist[(min(c, u), max(c, u))] = dc
            active -= {a, b}
            active.add(u)
        if method == "upgma":
            return clusters[next(iter(active))]
        a, b = sorted(active)
        return (clusters[a], clusters[b])

    @pytest.mark.parametrize("method", ["nj", "upgma"])
    @pytest.mark.parametrize("n", [2, 3, 7, 20])
    def test_matches_oracle(self, method, n):
        from ginfinity_tpu.pipelines.msa import build_guide_tree

        rng = np.random.default_rng(n * 7 + (method == "nj"))
        A = rng.random((n, n)).astype(np.float32)
        D = (A + A.T) / 2
        np.fill_diagonal(D, 0.0)
        assert build_guide_tree(D, method) == self._oracle_tree(D, method)

    def test_single_leaf(self):
        from ginfinity_tpu.pipelines.msa import build_guide_tree

        assert build_guide_tree(np.zeros((1, 1), np.float32)) == 0

    @pytest.mark.parametrize("method", ["nj", "upgma"])
    def test_500_leaves_under_a_second(self, method):
        import time

        from ginfinity_tpu.pipelines.msa import build_guide_tree

        rng = np.random.default_rng(9)
        A = rng.random((500, 500)).astype(np.float32)
        D = (A + A.T) / 2
        np.fill_diagonal(D, 0.0)
        t0 = time.perf_counter()
        tree = build_guide_tree(D, method)
        dt = time.perf_counter() - t0
        # every leaf appears exactly once
        def leaves(t):
            return [t] if isinstance(t, int) else leaves(t[0]) + leaves(t[1])
        assert sorted(leaves(tree)) == list(range(500))
        # generous bound: guards against accidental O(N^3)-per-merge
        # regressions (minutes), not micro-perf — wall clock on a shared
        # host under concurrent benchmark load measured up to ~1.6 s for
        # a run that takes ~0.4 s idle
        assert dt < 5.0, f"{method} took {dt:.2f}s"


class TestRefinement:
    @staticmethod
    def _toy_profiles(rng, n_seq=4, L=12, d=8):
        from ginfinity_tpu.pipelines.msa import SequenceRecord, initial_profiles

        base = rng.normal(size=(L, d)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        records = []
        for k in range(n_seq):
            emb = base + 0.05 * rng.normal(size=base.shape).astype(np.float32)
            emb /= np.linalg.norm(emb, axis=1, keepdims=True)
            records.append(SequenceRecord(f"s{k}", emb, dotbracket="((" + "." * (L - 4) + "))"))
            records[-1].paired_idx = None
        return initial_profiles(records)

    def test_extract_subprofile_roundtrip(self):
        from ginfinity_tpu.pipelines.msa import (
            extract_subprofile,
            merge_profiles,
        )

        rng = np.random.default_rng(0)
        profs = self._toy_profiles(rng)
        aln = merge_profiles(
            merge_profiles(profs[0], profs[1], -4.0, -0.5),
            merge_profiles(profs[2], profs[3], -4.0, -0.5),
            -4.0, -0.5,
        )
        sub = extract_subprofile(aln, list(aln.member_indices), profs)
        # extracting ALL members keeps every column and all aligned strings
        assert len(sub.stem) == len(aln.stem)
        for m in aln.member_indices:
            np.testing.assert_array_equal(sub.aligned_chars[m], aln.aligned_chars[m])
        # extracting one member yields its ungapped sequence
        solo = extract_subprofile(aln, [0], profs)
        assert (np.asarray(solo.aligned_chars[0]) != ord("-")).all()
        assert len(solo.aligned_chars[0]) == profs[0].mu_struct.shape[0]

    def test_sp_score_prefers_correct_alignment(self):
        from ginfinity_tpu.pipelines.msa import merge_profiles, sp_score

        rng = np.random.default_rng(1)
        profs = self._toy_profiles(rng, n_seq=2)
        good = merge_profiles(profs[0], profs[1], -4.0, -0.5)
        # a deliberately shifted "bad" alignment: gap the head of one side
        bad = merge_profiles(profs[0], profs[1], 100.0, 100.0)  # gap-free forced
        assert sp_score(good, profs) >= sp_score(bad, profs) - 1e-6
        # degenerate cases
        assert sp_score(profs[0], profs) == 0.0

    def test_tree_partitions(self):
        from ginfinity_tpu.pipelines.msa import tree_partitions

        # chain tree: nested prefixes of sizes 2..n-2
        t = 0
        for k in range(1, 6):
            t = (t, k)
        assert sorted(tuple(sorted(s)) for s in tree_partitions(t, 6)) == [
            (0, 1), (0, 1, 2), (0, 1, 2, 3)
        ]
        # balanced tree: {0,1} and its complement {2,3} dedupe to ONE split
        assert [tuple(sorted(s))
                for s in tree_partitions(((0, 1), (2, 3)), 4)] == [(2, 3)]
        # root-adjacent (shallow) subtrees come first
        deep = (((0, 1), 2), (3, (4, 5)))
        sizes = [len(s) for s in tree_partitions(deep, 6)]
        assert sizes[0] == 3  # a root child before the leaf-level pairs

    def test_refinement_partitions_schedule_respected(self):
        """Partitions are tried in order right after the leave-one-out
        sweep: with iters == n_members + len(partitions) and a scorer
        that records splits, every scheduled split must appear."""
        from ginfinity_tpu.pipelines.msa import (
            iterative_refinement,
            merge_profiles,
        )

        rng = np.random.default_rng(3)
        profs = self._toy_profiles(rng, n_seq=5)
        aln = profs[0]
        for k in range(1, 5):
            aln = merge_profiles(aln, profs[k], -4.0, -0.5)
        seen = []

        def scorer(A, B):
            seen.append(frozenset(A.member_indices))
            la, lb = len(A.stem), len(B.stem)
            return np.zeros((la, lb), np.float32)

        parts = [frozenset((0, 1)), frozenset((2, 3, 4))]
        iterative_refinement(
            aln, profs, 5 + len(parts), np.random.default_rng(0),
            -4.0, -0.5, scorer=scorer, partitions=parts,
        )
        # 5 singleton splits (LOO), then the two scheduled partitions
        assert [len(s) for s in seen[:5]] == [1] * 5
        assert seen[5:7] == parts

    def test_refinement_never_degrades_and_can_improve(self):
        from ginfinity_tpu.pipelines.msa import (
            iterative_refinement,
            merge_profiles,
            sp_score,
        )

        rng = np.random.default_rng(2)
        profs = self._toy_profiles(rng, n_seq=5, L=14)
        # build a poor starting alignment: harsh gap params force a bad
        # greedy merge order
        aln = profs[0]
        for p in profs[1:]:
            aln = merge_profiles(aln, p, -0.1, -0.1)
        s0 = sp_score(aln, profs)
        refined, stats = iterative_refinement(
            aln, profs, 10, np.random.default_rng(3), -4.0, -0.5
        )
        s1 = sp_score(refined, profs)
        assert s1 >= s0 - 1e-6
        assert stats["sp_final"] >= stats["sp_initial"] - 1e-6
        # every sequence still present, equal-length rows
        lens = {len(refined.aligned_chars[m]) for m in refined.member_indices}
        assert len(lens) == 1
        assert sorted(refined.member_indices) == sorted(aln.member_indices)

    def test_refinement_repairs_a_shifted_alignment(self):
        """A hand-misaligned start (one sequence shifted by 3 columns)
        must be repaired: SP score rises, the alignment compacts back to
        the ungapped width."""
        from ginfinity_tpu.pipelines.msa import (
            Profile,
            extract_subprofile,
            iterative_refinement,
            sp_score,
        )

        rng = np.random.default_rng(5)
        profs = self._toy_profiles(rng, n_seq=4, L=16)
        L, d = profs[0].mu_struct.shape
        n_cols = L + 3
        aligned = {}
        gap3 = np.full(3, ord("-"), np.uint8)
        for m in range(4):
            chars = np.asarray(profs[m].aligned_chars[m])
            aligned[m] = (
                np.concatenate([gap3, chars]) if m == 1
                else np.concatenate([chars, gap3])
            )
        bad = Profile(np.zeros((n_cols, d), np.float32), None,
                      np.zeros(n_cols, np.float32), [0, 1, 2, 3], aligned)
        bad = extract_subprofile(bad, [0, 1, 2, 3], profs)
        s0 = sp_score(bad, profs)
        refined, stats = iterative_refinement(
            bad, profs, 20, np.random.default_rng(1), -4.0, -0.5
        )
        assert stats["accepted"] >= 1
        assert sp_score(refined, profs) > s0 + 1.0
        assert len(refined.stem) <= len(bad.stem)
        # rows stay rectangular and complete
        lens = {len(refined.aligned_chars[m]) for m in refined.member_indices}
        assert lens == {len(refined.stem)}
        assert sorted(refined.member_indices) == [0, 1, 2, 3]

    def test_cli_refine_iters(self, tmp_path):
        import json

        from ginfinity_tpu.pipelines.msa import main

        prefix = str(tmp_path / "ref" / "msa")
        main(["--input", "dummy", "--out-prefix", prefix, "--refine-iters", "4"])
        with open(prefix + ".diagnostics/run_meta.json") as f:
            meta = json.load(f)
        assert "refinement" in meta
        assert meta["refinement"]["iters"] == 4
        assert meta["refinement"]["sp_final"] >= meta["refinement"]["sp_initial"] - 1e-6


class TestMSACLI:
    def test_dummy_mode(self, tmp_path):
        from ginfinity_tpu.pipelines.msa import main

        prefix = str(tmp_path / "out" / "msa")
        main(["--input", "dummy", "--out-prefix", prefix, "--max-pairs", "100"])
        assert os.path.exists(prefix + ".fasta")
        assert os.path.exists(prefix + ".sto")
        assert os.path.exists(prefix + ".aln.tsv")
        assert os.path.exists(prefix + ".diagnostics/run_meta.json")
        aln = pd.read_csv(prefix + ".aln.tsv", sep="\t")
        assert len(aln) == 5
        lens = aln["Aligned"].str.len().unique()
        assert len(lens) == 1  # all aligned rows same length

    def test_similar_sequences_align(self, tmp_path):
        """Three near-identical embedding rows must align nearly gap-free."""
        import json

        from ginfinity_tpu.pipelines.msa import main

        rng = np.random.default_rng(3)
        base = rng.normal(size=(20, 16)).astype(np.float32)
        rows = []
        for k in range(3):
            emb = base + 0.01 * rng.normal(size=base.shape).astype(np.float32)
            rows.append({
                "Name": f"r{k}",
                "node_embeddings": json.dumps(emb.round(6).tolist()),
                "DotBracket": "((((............))))",
            })
        inp = tmp_path / "in.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)
        prefix = str(tmp_path / "msa")
        main(["--input", str(inp), "--dotbracket-col", "DotBracket",
              "--out-prefix", prefix, "--alpha", "6.0", "--beta", "0.0"])
        aln = pd.read_csv(prefix + ".aln.tsv", sep="\t")
        # no gaps needed for near-identical sequences
        assert all("-" not in s for s in aln["Aligned"]), list(aln["Aligned"])
        assert all(s == "((((............))))" for s in aln["Aligned"])


class TestDualModalityDevicePath:
    def test_seq_weight_blend_on_device(self, tmp_path):
        """--seq-weight with base embeddings must blend on device: the
        MSA runs end-to-end, and pairs where both records carry base
        embeddings use the blended similarity (expected scores change
        vs seq_weight=0)."""
        import json

        from ginfinity_tpu.pipelines.msa import main

        rng = np.random.default_rng(6)
        L, d, db = 14, 8, 6
        base_struct = rng.normal(size=(L, d)).astype(np.float32)
        base_base = rng.normal(size=(L, db)).astype(np.float32)
        rows = []
        for k in range(3):
            emb = base_struct + 0.05 * rng.normal(size=(L, d)).astype(np.float32)
            row = {"Name": f"r{k}", "node_embeddings": json.dumps(emb.round(6).tolist())}
            if k < 2:  # third record has NO base embeddings
                bemb = base_base + 0.05 * rng.normal(size=(L, db)).astype(np.float32)
                row["base_embeddings"] = json.dumps(bemb.round(6).tolist())
            rows.append(row)
        inp = tmp_path / "in.tsv"
        pd.DataFrame(rows).to_csv(inp, sep="\t", index=False)

        metas = {}
        for w in ("0.0", "0.6"):
            prefix = str(tmp_path / f"w{w}" / "msa")
            main(["--input", str(inp), "--base-embeds-col", "base_embeddings",
                  "--seq-weight", w, "--out-prefix", prefix,
                  "--alpha", "5.0", "--beta", "0.0"])
            with open(prefix + ".diagnostics/run_meta.json") as f:
                metas[w] = json.load(f)["expected_scores"]
        e0 = np.array(metas["0.0"])
        e6 = np.array(metas["0.6"])
        # pair (0,1): both have base embeddings -> blend changes the score
        assert abs(e0[0][1] - e6[0][1]) > 1e-6
        # pair (0,2): record 2 has none -> blend is a no-op
        np.testing.assert_allclose(e0[0][2], e6[0][2], rtol=1e-5)


class TestModeDependentDefaults:
    """--gap-open/--alpha defaults are mode-dependent: profile mode keeps
    the reference's values (embed_msa.py:1262-1266), library mode uses
    the sweep-validated values (+0.07 held-out SP-F1, BASELINE.md "MSA
    parameter tuning"). Explicit flags always win in both modes."""

    def _run_meta(self, tmp_path, name, extra):
        import json

        from ginfinity_tpu.pipelines.msa import main

        prefix = str(tmp_path / name / "msa")
        main(["--input", "dummy", "--out-prefix", prefix,
              "--max-pairs", "100", *extra])
        with open(prefix + ".diagnostics/run_meta.json") as f:
            return json.load(f)

    def test_profile_defaults_reference_parity(self, tmp_path):
        meta = self._run_meta(tmp_path, "prof", ["--dp-score", "profile"])
        assert meta["gap_open"] == -10.0
        assert meta["alpha"] == 5.0

    def test_bare_default_is_tuned_library_mode(self, tmp_path):
        """Out of the box the CLI runs the measured-quality winner:
        library scoring with the tuned defaults (BASELINE.md 'MSA
        parameter tuning'); --dp-score profile restores the reference's
        scoring and parameter defaults."""
        meta = self._run_meta(tmp_path, "bare", [])
        assert meta["dp_score"] == "library"
        assert meta["gap_open"] == -4.0
        assert meta["alpha"] == 8.0

    def test_library_defaults_tuned(self, tmp_path):
        meta = self._run_meta(tmp_path, "lib", ["--dp-score", "library"])
        assert meta["gap_open"] == -4.0
        assert meta["alpha"] == 8.0

    def test_explicit_flags_win_in_library_mode(self, tmp_path):
        meta = self._run_meta(
            tmp_path, "explicit",
            ["--dp-score", "library", "--gap-open", "-10", "--alpha", "5"],
        )
        assert meta["gap_open"] == -10.0
        assert meta["alpha"] == 5.0
