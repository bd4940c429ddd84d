"""Test configuration: force CPU JAX with 8 virtual devices so sharding
paths are testable without TPU hardware (SURVEY.md §4 implication (4))."""

import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var in this image,
# so the CPU platform must be forced through jax.config (before any jax use).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Tests run CPU-forced JAX; CPU AOT executables are host-CPU-specific, so
# the persistent cache must not be shared across machines (stale entries
# from another host spam cpu_aot_loader machine-feature errors and risk
# SIGILL).  Key the test cache by the same host fingerprint the
# multichip dryrun uses.  The TPU-side default cache (utils/jaxinit.py)
# stays shared — TPU executables do not depend on host CPU features.
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "_graft_entry_fp", os.path.join(sys_path_root, "__graft_entry__.py")
    )
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.expanduser("~"), ".cache", "ginfinity_tpu",
        "xla_cache_cpu_" + _mod._host_fingerprint()
    )

import jax

jax.config.update("jax_platforms", "cpu")

import sys
import types

import pytest


REFERENCE_ROOT = "/root/reference/src"


@pytest.fixture(scope="session")
def reference_utils():
    """Import the reference's utils module (read-only) with torch_geometric
    stubbed out, so its graph builder can serve as a parity oracle.

    torch_geometric is not installed in this image; the reference only
    needs its ``Data`` container, which we fake with a simple namespace.
    """
    class _FakeData:
        def __init__(self, x=None, edge_index=None, edge_attr=None):
            self.x = x
            self.edge_index = edge_index
            self.edge_attr = edge_attr

    fake_tg = types.ModuleType("torch_geometric")
    fake_tg_data = types.ModuleType("torch_geometric.data")
    fake_tg_data.Data = _FakeData
    fake_tg.data = fake_tg_data
    # GPUtil is also absent; stub it (only used for system-info logging).
    fake_gputil = types.ModuleType("GPUtil")
    fake_gputil.getGPUs = lambda: []

    sys.modules.setdefault("torch_geometric", fake_tg)
    sys.modules.setdefault("torch_geometric.data", fake_tg_data)
    sys.modules.setdefault("GPUtil", fake_gputil)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import ginfinity.utils as ref_utils  # noqa: E402

    return ref_utils


@pytest.fixture(scope="session")
def sample_structures():
    """Structures from the reference's example dataset plus edge cases."""
    import pandas as pd

    df = pd.read_csv("/root/reference/example_data/sample_dataset.csv")
    structs = list(zip(df["sequence"].astype(str), df["secondary_structure"].astype(str)))
    extras = [
        ("ACGU", "...."),
        ("ACGUACGUAC", "((......))"),
        ("GGGAAACCCU", "(((...)))."),
        ("ACGUACGUACGUACGU", "((..[[..))..]].."),  # pseudoknot
        ("AC", "()"),
        ("ACGUACGU", "(.(...))"),
    ]
    return structs + extras
