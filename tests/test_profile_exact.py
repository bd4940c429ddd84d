"""Reference-exact profile DP (ops/pairhmm.py exact kernel).

The reference's progressive DP is pure-Python float32 when numba is
absent (embed_msa.py:874-930 under the no-op njit shim): the column dot
accumulates sequentially over the embedding dim and the match update
rounds twice — (best_prev + s) + comp.  The numpy oracle below
replicates that op order bit-for-bit (verified against the reference's
own _affine_dp_profile); the device kernel must match the oracle's
wavefront given the same scores, and the pool path must equal the host
path end-to-end.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ginfinity_tpu.ops.pairhmm import (  # noqa: E402
    _comp_bonus,
    _profile_ops_exact,
    _profile_wavefront_exact,
    _seq_dot_scores,
    _value_traceback,
    profile_align_batch_ops_exact,
)

NEG = np.float32(-1e30)


def oracle_seq_dot(muA, muB):
    """Sequential-over-d f32 accumulation (reference inner-loop bits)."""
    S = np.zeros((muA.shape[0], muB.shape[0]), np.float32)
    for d in range(muA.shape[1]):
        S = S + muA[:, None, d] * muB[None, :, d]
    return S


def oracle_dp(S, comp, go, ge):
    """Reference _affine_dp_profile bits: f32 storage, (prev+s)+comp two
    rounded adds, boundary chains from the recurrence."""
    La, Lb = S.shape
    M = np.full((La + 1, Lb + 1), NEG, np.float32)
    X = np.full((La + 1, Lb + 1), NEG, np.float32)
    Y = np.full((La + 1, Lb + 1), NEG, np.float32)
    M[0, 0] = 0.0
    go32, ge32 = np.float32(go), np.float32(ge)
    for i in range(1, La + 1):
        X[i, 0] = max(np.float32(M[i - 1, 0] + go32),
                      np.float32(X[i - 1, 0] + ge32))
    for j in range(1, Lb + 1):
        Y[0, j] = max(np.float32(M[0, j - 1] + go32),
                      np.float32(Y[0, j - 1] + ge32))
    for d in range(2, La + Lb + 1):
        lo, hi = max(1, d - Lb), min(La, d - 1)
        if lo > hi:
            continue
        i = np.arange(lo, hi + 1)
        j = d - i
        prev = np.maximum(np.maximum(M[i - 1, j - 1], X[i - 1, j - 1]),
                          Y[i - 1, j - 1])
        M[i, j] = (prev + S[i - 1, j - 1]) + comp[i - 1, j - 1]
        X[i, j] = np.maximum(M[i - 1, j] + go32, X[i - 1, j] + ge32)
        Y[i, j] = np.maximum(M[i, j - 1] + go32, Y[i, j - 1] + ge32)
    return M, X, Y


def oracle_walk(M, X, Y, La, Lb):
    """Reference value-based traceback (embed_msa.py:1042-1054)."""
    i, j = La, Lb
    ops = []
    while i > 0 or j > 0:
        cur, st = -1e31, 0
        if i > 0 and j > 0 and M[i, j] > cur:
            cur, st = M[i, j], 0
        if i > 0 and X[i, j] > cur:
            cur, st = X[i, j], 1
        if j > 0 and Y[i, j] > cur:
            cur, st = Y[i, j], 2
        ops.append(st)
        if st == 0:
            i, j = i - 1, j - 1
        elif st == 1:
            i -= 1
        else:
            j -= 1
    return ops[::-1]


def _rand_profile(rng, L, d=16):
    mu = rng.standard_normal((L, d)).astype(np.float32)
    mu /= np.linalg.norm(mu, axis=1, keepdims=True) + 1e-8
    stem = (rng.random(L) > 0.5).astype(np.float32)
    return mu, stem


def test_wavefront_matches_oracle_bits():
    """Given identical scores, the device wavefront reproduces the
    oracle DP bit-for-bit (two-step adds, boundary chains)."""
    rng = np.random.default_rng(7)
    for La, Lb in ((9, 13), (16, 16), (21, 5)):
        muA, stA = _rand_profile(rng, La)
        muB, stB = _rand_profile(rng, Lb)
        S = oracle_seq_dot(muA, muB)
        comp = np.where((stA[:, None] >= 0.5) == (stB[None, :] >= 0.5),
                        np.float32(0.2), np.float32(0.0))
        Mo, Xo, Yo = oracle_dp(S, comp, -10.0, -0.5)
        Mw, Xw, Yw = _profile_wavefront_exact(
            jnp.asarray(S)[None], jnp.asarray(comp)[None],
            jnp.asarray([La], jnp.int32), jnp.asarray([Lb], jnp.int32),
            jnp.float32(-10.0), jnp.float32(-0.5))
        ii = np.arange(La + 1)[:, None]
        jj = np.arange(Lb + 1)[None, :]
        for o, w in ((Mo, Mw), (Xo, Xw), (Yo, Yw)):
            dense = np.asarray(w)[ii + jj, 0, ii[:, 0][:, None]]
            mask = o > -1e29
            assert np.array_equal(np.where(mask, o, 0),
                                  np.where(mask, dense, 0))


def test_exact_ops_match_oracle_walk():
    """End-to-end exact kernel vs oracle: same S source on CPU may
    differ in last-ulp dot bits (FMA contraction), so the oracle here
    consumes the KERNEL's S — asserting wavefront+traceback semantics."""
    rng = np.random.default_rng(11)
    for La, Lb in ((12, 10), (8, 17)):
        muA, stA = _rand_profile(rng, La)
        muB, stB = _rand_profile(rng, Lb)
        S = np.asarray(_seq_dot_scores(
            jnp.asarray(muA)[None], jnp.asarray(muB)[None]))[0]
        comp = np.where((stA[:, None] >= 0.5) == (stB[None, :] >= 0.5),
                        np.float32(0.2), np.float32(0.0))
        Mo, Xo, Yo = oracle_dp(S, comp, -10.0, -0.5)
        want = oracle_walk(Mo, Xo, Yo, La, Lb)
        got = profile_align_batch_ops_exact(
            [(muA, muB)], [(stA, stB)], -10.0, -0.5)[0]
        assert list(got) == want


def test_seq_dot_close_to_exact():
    """The sequential accumulation is still a correct dot product."""
    rng = np.random.default_rng(3)
    muA, _ = _rand_profile(rng, 20, d=32)
    muB, _ = _rand_profile(rng, 15, d=32)
    S = np.asarray(_seq_dot_scores(
        jnp.asarray(muA)[None], jnp.asarray(muB)[None]))[0]
    np.testing.assert_allclose(S, muA @ muB.T, atol=5e-6)


def test_pool_and_host_paths_agree_end_to_end(tmp_path):
    """Profile-mode MSA: device pool path == host fallback path with the
    exact kernel active (both consume the same S bits per backend)."""
    from ginfinity_tpu.pipelines.msa import main as msa_main

    rng = np.random.default_rng(5)
    rows = ["Name\tnode_embeddings"]
    for k in range(5):
        L = int(rng.integers(8, 14))
        emb = rng.standard_normal((L, 8)).astype(np.float32).round(3)
        cell = "[" + ",".join(
            "[" + ",".join(f"{v}" for v in row) + "]" for row in emb
        ) + "]"
        rows.append(f"s{k}\t{cell}")
    tsv = tmp_path / "f.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    outs = {}
    for tag, pool in (("pool", "1"), ("host", "0")):
        out = tmp_path / tag / "msa"
        os.environ["GINFINITY_MSA_POOL"] = pool
        try:
            msa_main(["--input", str(tsv), "--out-prefix", str(out),
                      "--dp-score", "profile", "--alpha", "5.0",
                      "--beta", "0.0", "--seed", "1"])
        finally:
            os.environ.pop("GINFINITY_MSA_POOL", None)
        outs[tag] = (out.parent / "msa.aln.tsv").read_text()
    assert outs["pool"] == outs["host"]
