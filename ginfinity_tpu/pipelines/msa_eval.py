"""MSA output-quality evaluation against the reference pipeline.

The repo's MSA engine deliberately deviates from the reference on the
pair-HMM forward/backward (the reference's is numerically degenerate —
see :mod:`ginfinity_tpu.ops.pairhmm`).  This module turns that
documented deviation into a *measured* comparison: it generates RNA
families with known position-level homology (a common ancestor mutated
by substitutions/indels, every surviving position tracked back to its
ancestor coordinate), embeds every member with a real GIN checkpoint,
runs BOTH full MSA pipelines — this repo's ``ginfinity-embed-msa`` and
the reference's ``embed_msa.py`` (pure-Python path; numba is optional
there, reference embed_msa.py:56-64) — on the identical node-embedding
TSV, and scores both alignments against the ground truth:

- **SP (sum-of-pairs) recall/precision/F1**: over all sequence pairs,
  the fraction of truly homologous position pairs co-aligned into the
  same column (recall), and of co-aligned pairs that are truly
  homologous (precision).
- **Column agreement** (reference scoring, optimize_embed_msa.py:
  106-138 semantics generalized to all homologous pairs): +1 per
  correctly co-aligned homologous position pair, -1 otherwise
  — equal to (2*recall - 1) * n_true_pairs.

A stage-level probe isolates the pair-HMM correction: for sampled
pairs it computes match posteriors with this repo's sum-product kernel
AND with the reference's ``forward_backward_affine_logspace`` on the
same calibrated log-odds, and reports the posterior mass concentrated
on truly homologous cells.
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_MSA = "/root/reference/src/ginfinity/scripts/embed_msa.py"
REFERENCE_DATA = "/root/reference/example_data/sample_dataset.csv"


# --------------------------------------------------------------------------
# Synthetic families with known homology
# --------------------------------------------------------------------------


@dataclasses.dataclass
class FamilyMember:
    name: str
    structure: str
    sequence: str
    # posmap[i] = ancestor position of member position i, or -1 (insertion)
    posmap: np.ndarray


def random_structure(
    rng: np.random.Generator,
    n: int,
    p_stem: float = 0.75,
    min_paired_frac: float = 0.3,
) -> str:
    """Valid dot-bracket of length exactly ``n``: nested stems with
    hairpin loops >= 3 nt, occasional multiloop branching.  Regenerates
    until at least ``min_paired_frac`` of positions are paired — a
    near-featureless (all-loop) structure cannot anchor any structural
    alignment, so such draws would only add noise to evaluations."""

    def draw() -> str:
        out: list[str] = []

        def gen(m: int, depth: int) -> None:
            if m < 11 or rng.random() > p_stem * (0.9 ** depth):
                out.append("." * m)
                return
            if m >= 26 and rng.random() < 0.35:  # multiloop: two branches
                cut = int(rng.integers(11, m - 10))
                gen(cut, depth)
                gen(m - cut, depth)
                return
            h = int(rng.integers(2, min(6, (m - 5) // 2) + 1))
            lead = int(rng.integers(0, min(4, m - 2 * h - 3) + 1))
            tail = int(rng.integers(0, min(4, m - 2 * h - 3 - lead) + 1))
            out.append("." * lead + "(" * h)
            gen(m - 2 * h - lead - tail, depth + 1)
            out.append(")" * h + "." * tail)

        gen(n, 0)
        return "".join(out)

    for _ in range(100):
        s = draw()
        if (s.count("(") + s.count(")")) >= min_paired_frac * n:
            return s
    return s


_PAIRED = {"A": "U", "U": "A", "G": "C", "C": "G"}
_BASES = "ACGU"


def random_sequence(rng: np.random.Generator, structure: str) -> str:
    from ginfinity_tpu.graphs.dotbracket import pair_table

    pt = pair_table(structure)
    seq = [""] * len(structure)
    for i, p in enumerate(pt):
        if p < 0:
            seq[i] = _BASES[int(rng.integers(4))]
        elif p > i:
            seq[i] = _BASES[int(rng.integers(4))]
            seq[p] = _PAIRED[seq[i]]
    return "".join(seq)


def mutate_member(
    rng: np.random.Generator,
    structure: str,
    sequence: str,
    name: str,
    sub_rate: float = 0.1,
    del_rate: float = 0.05,
    ins_rate: float = 0.05,
) -> FamilyMember:
    """One descendant: delete positions (a deleted position's pairing
    partner becomes unpaired — the structure stays valid), insert
    unpaired runs, substitute letters.  Tracks every surviving position
    back to its ancestor coordinate."""
    from ginfinity_tpu.graphs.dotbracket import pair_table

    pt = pair_table(structure)
    n = len(structure)
    keep = rng.random(n) >= del_rate
    chars: list[str] = []
    seq_out: list[str] = []
    posmap: list[int] = []
    for i in range(n):
        if not keep[i]:
            continue
        c = structure[i]
        if pt[i] >= 0 and not keep[pt[i]]:
            c = "."  # partner deleted -> unpaired
        chars.append(c)
        s = sequence[i]
        if rng.random() < sub_rate:
            s = _BASES[int(rng.integers(4))]
        seq_out.append(s)
        posmap.append(i)
        if rng.random() < ins_rate:
            for _ in range(int(rng.integers(1, 4))):
                chars.append(".")
                seq_out.append(_BASES[int(rng.integers(4))])
                posmap.append(-1)
    return FamilyMember(
        name, "".join(chars), "".join(seq_out), np.asarray(posmap, np.int64)
    )


def make_family(
    seed: int,
    n_seqs: int = 6,
    anc_len: int = 120,
    sub_rate: float = 0.1,
    del_rate: float = 0.05,
    ins_rate: float = 0.05,
) -> list[FamilyMember]:
    rng = np.random.default_rng(seed)
    anc_struct = random_structure(rng, anc_len)
    anc_seq = random_sequence(rng, anc_struct)
    return [
        mutate_member(
            rng, anc_struct, anc_seq, f"seq{k + 1}", sub_rate, del_rate, ins_rate
        )
        for k in range(n_seqs)
    ]


def load_reference_ancestors(
    min_len: int = 0,
    max_len: int = 10**9,
    limit: int | None = None,
    csv_path: str = REFERENCE_DATA,
) -> list[tuple[str, str, str]]:
    """The reference's only in-repo dataset (example_data/sample_dataset.csv,
    100 real Rfam RNase-MRP structures, 198-593 nt) as (id, structure,
    sequence) ancestors for :func:`make_family_from_ancestor` — so quality
    numbers are grounded in real structures, not only the synthetic
    generator's distribution (nested stems, no pseudoknot-free bias of its
    own).  Sorted shortest-first so ``limit`` gives a deterministic,
    cost-bounded subset (the reference pipeline's pure-Python pair-HMM is
    O(L^2) per pair)."""
    import pandas as pd

    df = pd.read_csv(csv_path)
    rows = [
        (str(r["rnacentral_id"]), str(r["secondary_structure"]), str(r["sequence"]))
        for _, r in df.iterrows()
        if min_len <= len(str(r["secondary_structure"])) <= max_len
    ]
    rows.sort(key=lambda t: (len(t[1]), t[0]))
    return rows[:limit] if limit is not None else rows


def make_family_from_ancestor(
    seed: int,
    structure: str,
    sequence: str,
    n_seqs: int = 6,
    sub_rate: float = 0.1,
    del_rate: float = 0.05,
    ins_rate: float = 0.05,
) -> list[FamilyMember]:
    """Known-homology family whose ancestor is a REAL structure (e.g. one
    of :func:`load_reference_ancestors`) instead of a generator draw."""
    rng = np.random.default_rng(seed)
    return [
        mutate_member(
            rng, structure, sequence, f"seq{k + 1}", sub_rate, del_rate, ins_rate
        )
        for k in range(n_seqs)
    ]


# --------------------------------------------------------------------------
# Embeddings + shared input TSV
# --------------------------------------------------------------------------


def family_to_tsv(
    members: list[FamilyMember],
    model_path: str,
    out_tsv: str,
    include_structure: bool = True,
) -> None:
    """Node-embed every member with the checkpoint and write the TSV both
    MSA pipelines consume (Name + node_embeddings JSON [+ DotBracket])."""
    import pandas as pd

    from ginfinity_tpu.pipelines.engine import (
        InferenceEngine,
        preprocess_structures,
    )
    from ginfinity_tpu.pipelines.node_embed import serialize_matrix

    engine = InferenceEngine.from_checkpoint(model_path)
    cfg = engine.config
    pre = preprocess_structures(
        [m.structure for m in members],
        [m.sequence for m in members],
        graph_encoding=cfg.graph_encoding or "standard",
        seq_weight=cfg.seq_weight,
        feature_dim=cfg.node_feature_dim,
    )
    if len(pre.graphs) != len(members):
        raise RuntimeError(f"structures skipped in preprocessing: {pre.skipped}")
    mats = engine.node_embeddings(pre.graphs, base_only=True)
    rows = []
    for m, mat in zip(members, mats):
        row = {"Name": m.name, "node_embeddings": serialize_matrix(mat)}
        if include_structure:
            row["DotBracket"] = m.structure
        rows.append(row)
    pd.DataFrame(rows).to_csv(out_tsv, sep="\t", index=False)


# --------------------------------------------------------------------------
# Ground-truth scoring
# --------------------------------------------------------------------------


def _pos_to_col(aligned: str) -> np.ndarray:
    """cols[k] = alignment column of the k-th non-gap position."""
    a = np.frombuffer(aligned.encode("latin-1"), np.uint8)
    return np.nonzero(a != ord("-"))[0]


def sp_scores(msa: dict[str, str], members: list[FamilyMember]) -> dict:
    """Sum-of-pairs recall/precision/F1 + reference-style column
    agreement of an alignment against the known ancestor homology."""
    n_true = n_pred = n_hit = 0
    for ai in range(len(members)):
        for bi in range(ai + 1, len(members)):
            A, B = members[ai], members[bi]
            if A.name not in msa or B.name not in msa:
                raise ValueError(f"names missing from MSA: {A.name}, {B.name}")
            colA = _pos_to_col(msa[A.name])
            colB = _pos_to_col(msa[B.name])
            if colA.size != A.posmap.size or colB.size != B.posmap.size:
                raise ValueError(
                    f"aligned length mismatch for {A.name}/{B.name}: "
                    f"{colA.size}/{A.posmap.size}, {colB.size}/{B.posmap.size}"
                )
            # ancestor coordinate -> member position (homologous positions
            # are exactly those sharing an ancestor coordinate)
            anc_to_a = {int(p): i for i, p in enumerate(A.posmap) if p >= 0}
            anc_to_b = {int(p): j for j, p in enumerate(B.posmap) if p >= 0}
            common = set(anc_to_a) & set(anc_to_b)
            n_true += len(common)
            n_hit += sum(
                1
                for anc in common
                if colA[anc_to_a[anc]] == colB[anc_to_b[anc]]
            )
            # predicted co-aligned pairs: columns where both are non-gap
            n_pred += np.intersect1d(colA, colB, assume_unique=True).size
    recall = n_hit / n_true if n_true else 0.0
    precision = n_hit / n_pred if n_pred else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return {
        "sp_recall": recall,
        "sp_precision": precision,
        "sp_f1": f1,
        "column_agreement": 2 * n_hit - n_true,
        "n_true_pairs": n_true,
    }


def load_aln_tsv(path: str) -> dict[str, str]:
    import pandas as pd

    df = pd.read_csv(path, sep="\t")
    return dict(zip(df["Name"].astype(str), df["Aligned"].astype(str)))


# --------------------------------------------------------------------------
# Pipeline runners
# --------------------------------------------------------------------------

_SHARED_FLAGS = (
    "--name-col", "Name", "--embeds-col", "node_embeddings",
    "--tree", "nj", "--refine-iters", "0",
)


def _param_flags(params: dict) -> list[str]:
    out = []
    # refine_iters appears AFTER _SHARED_FLAGS' "--refine-iters 0"
    # default, so argparse's last-wins override applies
    for k in ("topk", "consistency_rounds", "alpha", "beta", "gap_open",
              "gap_extend", "max_pairs", "seed", "refine_iters",
              "refine_min_gain"):
        if k in params:
            out += [f"--{k.replace('_', '-')}", str(params[k])]
    return out


def run_repo_msa(tsv: str, out_prefix: str, params: dict,
                 dp_score: str = "profile") -> float:
    from ginfinity_tpu.pipelines.msa import main as msa_main

    t0 = time.perf_counter()
    msa_main(["--input", tsv, "--out-prefix", out_prefix,
              "--dp-score", dp_score, *_SHARED_FLAGS, *_param_flags(params)])
    return time.perf_counter() - t0


def run_reference_msa(tsv: str, out_prefix: str, params: dict,
                      timeout: int = 3600) -> float:
    """Subprocess the reference's embed_msa.py (pure-Python kernels —
    numba is optional there and absent in this image)."""
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, REFERENCE_MSA, "--input", tsv,
         "--out-prefix", out_prefix, *_SHARED_FLAGS, *_param_flags(params)],
        capture_output=True, text=True, timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference embed_msa.py failed (rc={proc.returncode}):\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    return time.perf_counter() - t0


DEFAULT_PARAMS = {
    # both CLIs' documented defaults (alpha/beta defaults print a WARN in
    # both; pin them explicitly so the comparison is parameter-identical)
    "topk": 20, "consistency_rounds": 1, "alpha": 5.0, "beta": 0.0,
    "gap_open": -10.0, "gap_extend": -0.5, "seed": 42,
}


def compare_on_family(
    members: list[FamilyMember],
    model_path: str,
    workdir: str,
    params: dict | None = None,
) -> dict:
    """Run both full pipelines on one family's shared embeddings TSV and
    score both alignments against the known homology."""
    os.makedirs(workdir, exist_ok=True)
    params = dict(DEFAULT_PARAMS, **(params or {}))
    tsv = os.path.join(workdir, "family_node_embeddings.tsv")
    family_to_tsv(members, model_path, tsv)

    repo_prefix = os.path.join(workdir, "repo", "msa")
    lib_prefix = os.path.join(workdir, "repo_library", "msa")
    tuned_prefix = os.path.join(workdir, "repo_library_tuned", "msa")
    ref_prefix = os.path.join(workdir, "ref", "msa")
    repo_sec = run_repo_msa(tsv, repo_prefix, params)
    lib_sec = run_repo_msa(tsv, lib_prefix, params, dp_score="library")
    # library mode at the repo's OUT-OF-BOX defaults (mode-resolved
    # gap_open/alpha, BASELINE.md "MSA parameter tuning") — what a user
    # gets with no flags; params above stay reference-identical
    tuned_params = {k: v for k, v in params.items()
                    if k not in ("alpha", "beta", "gap_open", "gap_extend")}
    tuned_sec = run_repo_msa(tsv, tuned_prefix, tuned_params,
                             dp_score="library")
    ref_sec = run_reference_msa(tsv, ref_prefix, params)

    repo_scores = sp_scores(load_aln_tsv(repo_prefix + ".aln.tsv"), members)
    lib_scores = sp_scores(load_aln_tsv(lib_prefix + ".aln.tsv"), members)
    tuned_scores = sp_scores(load_aln_tsv(tuned_prefix + ".aln.tsv"), members)
    ref_scores = sp_scores(load_aln_tsv(ref_prefix + ".aln.tsv"), members)
    return {
        "repo": {**repo_scores, "wall_sec": round(repo_sec, 2)},
        "repo_library": {**lib_scores, "wall_sec": round(lib_sec, 2)},
        "repo_library_tuned": {**tuned_scores, "wall_sec": round(tuned_sec, 2)},
        "reference": {**ref_scores, "wall_sec": round(ref_sec, 2)},
        "params": params,
        "n_seqs": len(members),
        "lengths": [len(m.structure) for m in members],
    }


# --------------------------------------------------------------------------
# Stage-level pair-HMM isolation
# --------------------------------------------------------------------------


def _reference_msa_module():
    """Import the reference embed_msa.py as a module (read-only; its
    numba decorator degrades to a no-op without numba)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("_ref_embed_msa", REFERENCE_MSA)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_embed_msa"] = mod  # dataclass processing needs this
    spec.loader.exec_module(mod)
    return mod


def posterior_stage_quality(
    members: list[FamilyMember],
    model_path: str,
    workdir: str,
    params: dict | None = None,
    max_pairs: int = 6,
) -> dict:
    """Isolate the corrected pair-HMM: identical calibrated log-odds
    matrices go through this repo's sum-product forward/backward AND the
    reference's ``forward_backward_affine_logspace``; report the
    fraction of total posterior mass on truly homologous cells and the
    mean posterior assigned to them."""
    import pandas as pd

    from ginfinity_tpu.ops.pairhmm import pairhmm_posteriors
    from ginfinity_tpu.pipelines.msa import (
        _l2_normalize_rows,
        _parse_matrix_cell,
        calibrate_log_odds,
    )

    params = dict(DEFAULT_PARAMS, **(params or {}))
    tsv = os.path.join(workdir, "family_node_embeddings.tsv")
    if not os.path.exists(tsv):
        os.makedirs(workdir, exist_ok=True)
        family_to_tsv(members, model_path, tsv)
    df = pd.read_csv(tsv, sep="\t").set_index("Name")
    embs = {
        name: _l2_normalize_rows(_parse_matrix_cell(df.loc[name, "node_embeddings"]))
        for name in (m.name for m in members)
    }
    ref_mod = _reference_msa_module()

    pair_list = [
        (a, b)
        for a in range(len(members))
        for b in range(a + 1, len(members))
    ][:max_pairs]
    mats = []
    truths = []
    for a, b in pair_list:
        A, B = members[a], members[b]
        S = embs[A.name] @ embs[B.name].T
        mats.append(calibrate_log_odds(S, params["alpha"], params["beta"]))
        anc_to_b = {int(p): j for j, p in enumerate(B.posmap) if p >= 0}
        t = np.zeros(S.shape, bool)
        for i, p in enumerate(A.posmap):
            j = anc_to_b.get(int(p), None) if p >= 0 else None
            if j is not None:
                t[i, j] = True
        truths.append(t)

    ours = pairhmm_posteriors(mats, params["gap_open"], params["gap_extend"])
    theirs = [
        ref_mod.forward_backward_affine_logspace(
            m.astype(np.float32), params["gap_open"], params["gap_extend"]
        )
        for m in mats
    ]

    def stats(posts):
        # a pair can have ZERO surviving homologous positions (heavy
        # indel draws); an empty-mask mean would NaN the whole report
        kept = [(p, t) for p, t in zip(posts, truths) if t.any()]
        if not kept:
            return {"true_mass_fraction": 0.0,
                    "mean_posterior_on_true": 0.0,
                    "finite_fraction": 1.0}
        mass_frac = float(
            np.mean([p[t].sum() / max(p.sum(), 1e-9) for p, t in kept])
        )
        mean_true = float(np.mean([p[t].mean() for p, t in kept]))
        finite = float(np.mean([np.isfinite(p).mean() for p in posts]))
        return {
            "true_mass_fraction": mass_frac,
            "mean_posterior_on_true": mean_true,
            "finite_fraction": finite,
        }

    return {"repo": stats(ours), "reference": stats(theirs),
            "n_pairs": len(pair_list)}


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Compare MSA output quality vs the reference pipeline "
        "on synthetic families with known homology."
    )
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--families", type=int, default=3)
    ap.add_argument("--n-seqs", type=int, default=6)
    ap.add_argument("--anc-len", type=int, default=120)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default=None)
    ap.add_argument(
        "--ancestors", choices=["generator", "reference"], default="generator",
        help="family ancestors: the synthetic generator (default) or real "
        "Rfam structures from the reference's example_data",
    )
    ap.add_argument("--anc-min-len", type=int, default=0,
                    help="reference-ancestor length filter (lower bound)")
    ap.add_argument("--anc-max-len", type=int, default=10**9,
                    help="reference-ancestor length filter (upper bound)")
    ap.add_argument("--max-pairs", type=int, default=None,
                    help="kNN pair cap passed to BOTH engines (required for "
                    "at-scale runs; the reference caps the same way)")
    args = ap.parse_args(argv)

    params = {"max_pairs": args.max_pairs} if args.max_pairs else {}
    ancestors = None
    if args.ancestors == "reference":
        ancestors = load_reference_ancestors(
            args.anc_min_len, args.anc_max_len, limit=args.families
        )
        if len(ancestors) < args.families:
            raise SystemExit(
                f"only {len(ancestors)} reference ancestors in "
                f"[{args.anc_min_len}, {args.anc_max_len}]"
            )
    results = []
    for f in range(args.families):
        if ancestors is not None:
            anc_id, struct, seq = ancestors[f]
            members = make_family_from_ancestor(
                args.seed + 1000 * f, struct, seq, n_seqs=args.n_seqs
            )
        else:
            members = make_family(
                args.seed + 1000 * f, n_seqs=args.n_seqs, anc_len=args.anc_len
            )
        wd = os.path.join(args.workdir, f"family{f}")
        res = compare_on_family(members, args.model_path, wd, params=params)
        if ancestors is not None:
            res["ancestor_id"] = anc_id
        res["posterior_stage"] = posterior_stage_quality(
            members, args.model_path, wd, params=params
        )
        results.append(res)
        print(
            f"family {f}: repo SP-F1 {res['repo']['sp_f1']:.4f} "
            f"({res['repo']['wall_sec']}s) vs reference "
            f"{res['reference']['sp_f1']:.4f} ({res['reference']['wall_sec']}s)"
        )
    summary = {
        "repo_sp_f1_mean": float(np.mean([r["repo"]["sp_f1"] for r in results])),
        "reference_sp_f1_mean": float(
            np.mean([r["reference"]["sp_f1"] for r in results])
        ),
        "families": results,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "families"}))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(summary, fh, indent=2)
    return summary


if __name__ == "__main__":
    main()
