"""End-to-end MSA output quality vs the reference pipeline.

The repo deliberately corrects the reference's pair-HMM forward/backward
(ops/pairhmm.py docstring; reference embed_msa.py:397-517).  These tests
run BOTH full pipelines — ginfinity-embed-msa and the reference's
embed_msa.py (pure-Python path) — on identical node-embedding TSVs for
families with known position-level homology, and assert the repo's
alignments score at least as well (sum-of-pairs F1), plus a stage-level
probe isolating the corrected kernel.
"""

import numpy as np
import pytest

CKPT = "/root/reference/src/ginfinity/weights/gin_weights_regression_180925.pth"


class TestFamilyGenerator:
    def test_structures_valid_and_posmaps_consistent(self):
        from ginfinity_tpu.graphs.dotbracket import pair_table
        from ginfinity_tpu.pipelines.msa_eval import make_family

        for seed in range(5):
            members = make_family(seed, n_seqs=5, anc_len=90)
            for m in members:
                assert pair_table(m.structure, strict=False) is not None
                assert len(m.structure) == len(m.sequence) == m.posmap.size
                surv = m.posmap[m.posmap >= 0]
                # ancestor coordinates strictly increase (no reordering)
                assert (np.diff(surv) > 0).all()

    def test_sp_scores_perfect_on_truth(self):
        """Scoring sanity: aligning every member by ancestor coordinate
        (the ground truth itself) must score recall 1.0."""
        from ginfinity_tpu.pipelines.msa_eval import make_family, sp_scores

        members = make_family(1, n_seqs=4, anc_len=80)
        # build the true MSA: one column per ancestor coordinate, plus a
        # unique column per insertion placed right after the inserting
        # member's previous ancestor coordinate (sort key keeps every
        # member's non-gap columns strictly increasing)
        keys = set()
        per_member_keys = {}
        for mi, m in enumerate(members):
            prev, serial = -1, 0
            mkeys = []
            for anc in m.posmap:
                if anc >= 0:
                    prev, serial = int(anc), 0
                    k = (int(anc), 0, 0, 0)
                else:
                    serial += 1
                    k = (prev, 1, mi, serial)
                keys.add(k)
                mkeys.append(k)
            per_member_keys[mi] = mkeys
        col_of = {k: i for i, k in enumerate(sorted(keys))}
        total = len(col_of)
        msa = {}
        for mi, m in enumerate(members):
            row = ["-"] * total
            for k in per_member_keys[mi]:
                row[col_of[k]] = "x"
            msa[m.name] = "".join(row)
        s = sp_scores(msa, members)
        assert s["sp_recall"] == 1.0
        assert s["sp_precision"] == 1.0
        assert s["n_true_pairs"] > 0


class TestMsaQualityVsReference:
    @pytest.fixture(scope="class")
    def comparison(self, tmp_path_factory):
        from ginfinity_tpu.pipelines.msa_eval import (
            compare_on_family,
            make_family,
            posterior_stage_quality,
        )

        results = []
        probes = []
        for f in range(3):
            members = make_family(
                300 + f, n_seqs=4, anc_len=100,
                sub_rate=0.05, del_rate=0.03, ins_rate=0.03,
            )
            wd = str(tmp_path_factory.mktemp(f"msaq{f}"))
            results.append(compare_on_family(members, CKPT, wd))
            probes.append(posterior_stage_quality(members, CKPT, wd))
        return results, probes

    def test_repo_msa_at_least_as_good(self, comparison):
        """Default (reference-parity) scoring must not lose to the
        reference; the library mode must clearly beat it."""
        results, _ = comparison
        repo = np.mean([r["repo"]["sp_f1"] for r in results])
        lib = np.mean([r["repo_library"]["sp_f1"] for r in results])
        ref = np.mean([r["reference"]["sp_f1"] for r in results])
        # parity-mode engines are near-identical by design; allow noise
        assert repo >= ref - 0.03, f"repo SP-F1 {repo:.4f} < reference {ref:.4f}"
        assert lib >= ref + 0.1, (
            f"library SP-F1 {lib:.4f} not clearly above reference {ref:.4f}"
        )
        assert lib >= repo, (lib, repo)

    def test_library_mode_wins_every_family(self, comparison):
        results, _ = comparison
        for r in results:
            assert r["repo_library"]["sp_f1"] >= r["reference"]["sp_f1"], r

    def test_tuned_defaults_do_not_regress(self, comparison):
        """Out-of-box library mode (mode-resolved gap_open/alpha,
        BASELINE.md 'MSA parameter tuning') must stay at least at the
        reference-parameter library level on average, and clearly above
        the reference."""
        results, _ = comparison
        lib = np.mean([r["repo_library"]["sp_f1"] for r in results])
        tuned = np.mean([r["repo_library_tuned"]["sp_f1"] for r in results])
        ref = np.mean([r["reference"]["sp_f1"] for r in results])
        assert tuned >= lib - 0.03, (tuned, lib)
        assert tuned >= ref + 0.1, (tuned, ref)

    def test_alignments_score_nontrivially(self, comparison):
        results, _ = comparison
        for r in results:
            assert r["repo"]["sp_recall"] > 0.1
            assert r["repo"]["n_true_pairs"] > 50

    def test_corrected_pairhmm_isolated(self, comparison):
        """The sum-product kernel must put substantially more posterior
        probability on truly homologous cells than the reference's
        degenerate forward/backward, on identical log-odds inputs."""
        _, probes = comparison
        ours = np.mean([p["repo"]["mean_posterior_on_true"] for p in probes])
        theirs = np.mean(
            [p["reference"]["mean_posterior_on_true"] for p in probes]
        )
        assert ours > 2 * theirs, (ours, theirs)
        for p in probes:
            assert p["repo"]["finite_fraction"] == 1.0


def test_param_flags_refine_override_wins():
    """refine_iters must reach the CLI: _SHARED_FLAGS pins a
    '--refine-iters 0' default, and _param_flags appends the override
    AFTER it so argparse's last-wins applies (a silent drop here made a
    refinement A/B measure zero delta)."""
    from ginfinity_tpu.pipelines.msa import build_parser
    from ginfinity_tpu.pipelines.msa_eval import _SHARED_FLAGS, _param_flags

    flags = _param_flags({"refine_iters": 3, "alpha": 5})
    assert "--refine-iters" in flags
    args = build_parser().parse_args(
        ["--input", "dummy", *_SHARED_FLAGS, *flags]
    )
    assert args.refine_iters == 3


class TestRealAncestorFamilies:
    """Families grounded in the reference's real Rfam structures
    (example_data/sample_dataset.csv) instead of the synthetic generator
    (VERDICT r4: every quality number rested on one generator)."""

    def test_load_reference_ancestors(self):
        from ginfinity_tpu.pipelines.msa_eval import load_reference_ancestors

        rows = load_reference_ancestors()
        assert len(rows) == 100
        lens = [len(s) for _, s, _ in rows]
        assert lens == sorted(lens)  # shortest-first for cost-bounded limit
        assert min(lens) >= 198 and max(lens) <= 593
        for _, s, q in rows:
            assert len(s) == len(q)
        sub = load_reference_ancestors(min_len=250, max_len=350, limit=3)
        assert len(sub) == 3
        assert all(250 <= len(s) <= 350 for _, s, _ in sub)

    def test_family_from_real_ancestor_invariants(self):
        from ginfinity_tpu.graphs.dotbracket import (
            is_valid_dot_bracket,
            pair_table,
        )
        from ginfinity_tpu.pipelines.msa_eval import (
            load_reference_ancestors,
            make_family_from_ancestor,
        )

        for f, (anc_id, struct, seq) in enumerate(
            load_reference_ancestors(limit=3)
        ):
            members = make_family_from_ancestor(100 + f, struct, seq, n_seqs=4)
            assert len(members) == 4
            for m in members:
                assert is_valid_dot_bracket(m.structure)
                assert pair_table(m.structure, strict=False) is not None
                assert len(m.structure) == len(m.sequence) == m.posmap.size
                surv = m.posmap[m.posmap >= 0]
                assert (np.diff(surv) > 0).all()
                assert surv.min() >= 0 and surv.max() < len(struct)
                # default del 0.05 / ins 0.05: length stays in a sane band
                assert 0.75 * len(struct) <= m.posmap.size <= 1.35 * len(struct)

    def test_truth_msa_scores_perfectly_on_real_ancestor(self):
        from ginfinity_tpu.pipelines.msa_eval import (
            load_reference_ancestors,
            make_family_from_ancestor,
            sp_scores,
        )

        anc_id, struct, seq = load_reference_ancestors(limit=1)[0]
        members = make_family_from_ancestor(7, struct, seq, n_seqs=4)
        keys = set()
        per_member_keys = {}
        for mi, m in enumerate(members):
            prev, serial = -1, 0
            mkeys = []
            for anc in m.posmap:
                if anc >= 0:
                    prev, serial = int(anc), 0
                    k = (int(anc), 0, 0, 0)
                else:
                    serial += 1
                    k = (prev, 1, mi, serial)
                keys.add(k)
                mkeys.append(k)
            per_member_keys[mi] = mkeys
        col_of = {k: i for i, k in enumerate(sorted(keys))}
        msa = {}
        for mi, m in enumerate(members):
            row = ["-"] * len(col_of)
            for k in per_member_keys[mi]:
                row[col_of[k]] = "x"
            msa[m.name] = "".join(row)
        s = sp_scores(msa, members)
        assert s["sp_recall"] == 1.0
        assert s["sp_precision"] == 1.0
        assert s["n_true_pairs"] > 500
