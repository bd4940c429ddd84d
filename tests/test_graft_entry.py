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


def test_cpu_cache_dir_is_host_keyed():
    """CPU-forced processes must not share the TPU persistent-cache dir:
    XLA:CPU AOT entries embed host CPU features (cross-host SIGILL risk,
    cpu_aot_loader warning spam).  The default dir is host-keyed for CPU
    and the fingerprint matches the standalone copy in __graft_entry__
    (which conftest uses for the test cache)."""
    import importlib.util

    from ginfinity_tpu.utils.jaxinit import _default_cache_dir, host_fingerprint

    cpu_dir = _default_cache_dir("cpu")
    tpu_dir = _default_cache_dir(None)
    assert cpu_dir != tpu_dir
    assert cpu_dir.endswith("xla_cache_cpu_" + host_fingerprint())
    assert tpu_dir.endswith("xla_cache")

    spec = importlib.util.spec_from_file_location(
        "_graft_entry_fp_test",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._host_fingerprint() == host_fingerprint()
