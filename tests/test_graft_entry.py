"""The driver's entry points must keep working — especially
``dryrun_multichip``, which validates the full multi-chip training step
on a virtual CPU mesh (the round-1 driver run failed because it hit the
axon TPU backend; see __graft_entry__.dryrun_multichip docstring)."""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess():
    """Run exactly what the driver runs: dryrun_multichip(8) from a fresh
    process with no special env (the function must set up the virtual CPU
    mesh itself)."""
    env = dict(os.environ)
    # Simulate the driver: no pre-set CPU forcing.
    env.pop("_GINFINITY_DRYRUN_CHILD", None)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout, proc.stdout[-2000:]


def test_entry_compiles_single_device():
    import jax

    sys.path.insert(0, REPO_ROOT)
    try:
        import __graft_entry__
    finally:
        sys.path.remove(REPO_ROOT)
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 128
    assert bool(jax.numpy.isfinite(out).all())
