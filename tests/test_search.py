"""Sharded top-k search: exactness vs brute force on the 8-device CPU mesh."""

import numpy as np
import pytest

from ginfinity_tpu.parallel.mesh import make_data_mesh
from ginfinity_tpu.parallel.search import TopKSearcher, brute_force_topk, recall_at_k


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 64)).astype(np.float32)
    queries = rng.normal(size=(37, 64)).astype(np.float32)
    return corpus, queries


class TestTopKSearcher:
    def test_mesh_has_8_devices(self):
        assert make_data_mesh().devices.size == 8

    @pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "dot"])
    def test_exact_vs_brute_force(self, data, metric):
        corpus, queries = data
        s = TopKSearcher(corpus, metric=metric, query_block=64)
        v, i = s.search(queries, k=10)
        tv, ti = brute_force_topk(corpus, queries, 10, metric=metric)
        assert recall_at_k(i, ti) == 1.0
        np.testing.assert_allclose(np.sort(v, 1), np.sort(tv, 1), rtol=1e-4, atol=1e-4)

    def test_sqeuclidean_scores_are_distances(self, data):
        corpus, queries = data
        s = TopKSearcher(corpus, query_block=64)
        v, i = s.search(queries[:3], k=5)
        for q in range(3):
            d = np.sum((corpus[i[q]] - queries[q]) ** 2, axis=1)
            np.testing.assert_allclose(v[q], d, rtol=1e-3, atol=1e-3)

    def test_k_clamped_to_corpus(self):
        corpus = np.eye(5, 8, dtype=np.float32)
        s = TopKSearcher(corpus, query_block=8)
        v, i = s.search(corpus[:2], k=50)
        assert v.shape == (2, 5)
        # nearest neighbour of a corpus row is itself at distance 0
        assert i[0, 0] == 0 and v[0, 0] < 1e-5

    @pytest.mark.parametrize("storage", ["bf16", "int8"])
    @pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "dot"])
    def test_compressed_storage_host_rescore_exact(self, data, storage, metric):
        """Compressed HBM residency + exact f32 host re-score: recall
        stays 1.0 on this well-separated corpus, and the returned scores
        are exact (computed from the retained f32 rows)."""
        corpus, queries = data
        s = TopKSearcher(
            corpus, metric=metric, query_block=64, storage=storage,
            rescore="host",
        )
        v, i = s.search(queries, k=10)
        tv, ti = brute_force_topk(corpus, queries, 10, metric=metric)
        assert recall_at_k(i, ti) == 1.0
        np.testing.assert_allclose(np.sort(v, 1), np.sort(tv, 1), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("metric", ["sqeuclidean", "cosine", "dot"])
    def test_int8_device_rescore_recall(self, data, metric):
        """Default device re-score: the int8 residual plane makes
        refined scores ~int16-accurate — recall 1.0 with NO host corpus
        and no host compute."""
        corpus, queries = data
        s = TopKSearcher(corpus, metric=metric, query_block=64, storage="int8")
        assert s._host_corpus is None
        v, i = s.search(queries, k=10)
        tv, ti = brute_force_topk(corpus, queries, 10, metric=metric)
        assert recall_at_k(i, ti) == 1.0
        np.testing.assert_allclose(np.sort(v, 1), np.sort(tv, 1), rtol=1e-3, atol=1e-2)

    def test_device_rescore_k_beyond_candidate_cap(self, monkeypatch):
        """k > _RESCORE_CAND_CAP must not crash the device-rescore path:
        the preselect cap has to keep at least local_k candidates (it
        used to trim to the cap and then ask top_k for more).  The cap
        is patched down so the multi-tile preselect branch fires at a
        test-sized corpus (needs per-shard rows > corpus_tile)."""
        from ginfinity_tpu.parallel import search as search_mod

        monkeypatch.setattr(search_mod, "_RESCORE_CAND_CAP", 32)
        rng = np.random.default_rng(3)
        corpus = rng.normal(size=(70000, 8)).astype(np.float32)
        queries = rng.normal(size=(8, 8)).astype(np.float32)
        s = TopKSearcher(corpus, query_block=8, storage="int8")
        assert s.corpus_tile * 2 <= s._corpus.shape[0] // 8, \
            "test needs >= 2 tiles/shard to hit the preselect branch"
        v, i = s.search(queries, k=64)
        assert v.shape == (8, 64) and i.shape == (8, 64)
        tv, ti = brute_force_topk(corpus, queries, 64)
        assert recall_at_k(i, ti) >= 0.95
        np.testing.assert_allclose(np.sort(v, 1), np.sort(tv, 1),
                                   rtol=1e-3, atol=1e-2)

    def test_exact_candidate_topk_matches_approx(self, data):
        """candidate_recall=None switches the compressed-storage scan's
        candidate generation from approx_max_k back to exact lax.top_k;
        both must reach recall 1.0 here (the exact f32 re-score re-ranks
        every emitted candidate either way)."""
        corpus, queries = data
        exact = TopKSearcher(corpus, query_block=64, storage="int8",
                             candidate_recall=None)
        approx = TopKSearcher(corpus, query_block=64, storage="int8")
        _, ie = exact.search(queries, k=10)
        _, ia = approx.search(queries, k=10)
        _, ti = brute_force_topk(corpus, queries, 10)
        assert recall_at_k(ie, ti) == 1.0
        assert recall_at_k(ia, ti) == 1.0

    def test_f32_fast_default_vs_host_exact_merge(self, data):
        """The DEFAULT f32 config (precision='highest', rescore='device')
        now uses the candidate-emit scan (_f32_fast); rescore='host'
        keeps the fully-exact running merge.  Both must agree with brute
        force on recall AND return true squared distances."""
        corpus, queries = data
        fast = TopKSearcher(corpus, query_block=64)
        exact = TopKSearcher(corpus, query_block=64, rescore="host")
        assert fast._f32_fast and not exact._f32_fast
        vf, i_f = fast.search(queries, k=10)
        ve, i_e = exact.search(queries, k=10)
        _, ti = brute_force_topk(corpus, queries, 10)
        assert recall_at_k(i_f, ti) == 1.0
        assert recall_at_k(i_e, ti) == 1.0
        np.testing.assert_allclose(np.sort(vf, 1), np.sort(ve, 1),
                                   rtol=1e-4, atol=1e-4)
        for q in range(3):
            d = np.sum((corpus[i_f[q]] - queries[q]) ** 2, axis=1)
            np.testing.assert_allclose(vf[q], d, rtol=1e-3, atol=1e-3)

    def test_bf16_precision_f32_storage_rescores_on_device(self, data):
        """precision='bf16' with f32 storage (default rescore='device')
        must emit candidates from the fast bf16 Gram scan and re-score
        them exactly in f32 on device — recall ~1.0 instead of the raw
        bf16 pass's tie-swap losses; scores must be true distances."""
        corpus, queries = data
        s = TopKSearcher(corpus, query_block=64, precision="bf16")
        assert s._bf16_rescore and s._host_corpus is None
        v, i = s.search(queries, k=10)
        _, ti = brute_force_topk(corpus, queries, 10)
        assert recall_at_k(i, ti) >= 0.99
        for q in range(4):
            d = np.sum((corpus[i[q]] - queries[q]) ** 2, axis=1)
            np.testing.assert_allclose(v[q], d, rtol=1e-4, atol=1e-5)

    def test_bf16_device_rescore_recall(self, data):
        """bf16 residency with device re-score: rows reconstruct at bf16
        precision, so recall may drop slightly below the host-exact
        path but must stay near 1.0."""
        corpus, queries = data
        s = TopKSearcher(corpus, query_block=64, storage="bf16")
        _, i = s.search(queries, k=10)
        _, ti = brute_force_topk(corpus, queries, 10)
        assert recall_at_k(i, ti) >= 0.99

    def test_compressed_scores_are_exact_distances(self, data):
        corpus, queries = data
        s = TopKSearcher(corpus, query_block=64, storage="int8", rescore="host")
        v, i = s.search(queries[:4], k=5)
        for q in range(4):
            d = np.sum((corpus[i[q]] - queries[q]) ** 2, axis=1)
            np.testing.assert_allclose(v[q], d, rtol=1e-5, atol=1e-6)

    def test_int8_device_rescore_distances_near_exact(self, data):
        corpus, queries = data
        s = TopKSearcher(corpus, query_block=64, storage="int8")
        v, i = s.search(queries[:4], k=5)
        for q in range(4):
            d = np.sum((corpus[i[q]] - queries[q]) ** 2, axis=1)
            np.testing.assert_allclose(v[q], d, rtol=1e-3, atol=1e-2)

    @pytest.mark.parametrize("rescore", ["device", "host"])
    def test_compressed_uneven_padding(self, rescore):
        rng = np.random.default_rng(2)
        corpus = rng.normal(size=(13, 16)).astype(np.float32)
        s = TopKSearcher(corpus, query_block=4, storage="bf16", rescore=rescore)
        v, i = s.search(corpus, k=13)
        assert i.max() < 13
        for q in range(13):
            assert i[q, 0] == q

    def test_uneven_corpus_padding(self):
        # corpus size not divisible by 8 devices
        rng = np.random.default_rng(1)
        corpus = rng.normal(size=(13, 16)).astype(np.float32)
        s = TopKSearcher(corpus, query_block=4)
        v, i = s.search(corpus, k=13)
        # padding rows must never appear in results
        assert i.max() < 13
        for q in range(13):
            assert i[q, 0] == q
