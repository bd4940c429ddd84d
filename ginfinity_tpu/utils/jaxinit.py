"""JAX runtime initialization for ginfinity_tpu.

Enables the persistent XLA compilation cache (first TPU compiles over
the axon tunnel cost minutes; cached reloads cost milliseconds) unless
the user already configured one.  Imported for its side effect by
ginfinity_tpu/__init__.py.
"""

from __future__ import annotations

import os
import time


def host_fingerprint() -> str:
    """Stable per-machine key for CPU-backend XLA caches: a hash of the
    host's CPU feature flags (the exact thing XLA:CPU's AOT loader
    checks before refusing/warning on foreign executables).

    A standalone copy lives in ``__graft_entry__.py`` — that shim must
    stay importable without touching this package (the driver loads it
    before env setup)."""
    import hashlib
    import platform

    material = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    material += line
                    break
    except OSError:
        material += platform.processor()
    return hashlib.sha256(material.encode()).hexdigest()[:16]


def _default_cache_dir(platforms: str | None) -> str:
    """CPU-forced processes get a host-keyed cache dir: XLA:CPU AOT
    executables embed host CPU features, so sharing them across machines
    spams cpu_aot_loader machine-feature errors and risks SIGILL.  TPU
    executables are host-independent and share one dir (the whole point
    of the cache — tunnel compiles cost minutes).

    Residual cosmetic warnings: XLA:CPU injects +prefer-no-scatter /
    +prefer-no-gather pseudo-features into the compile-time target
    string, but LLVM host detection never reports them, so the AOT
    loader warns on EVERY cache reload — even for entries this same
    machine wrote moments earlier (verified: fresh cache, two identical
    runs — 0 warnings on compile, 6 on reload).  That upstream false
    positive is harmless and cannot be silenced from user code without
    muting all native logging; the host-keyed dir still prevents the
    real cross-machine SIGILL hazard."""
    base = os.path.join(os.path.expanduser("~"), ".cache", "ginfinity_tpu")
    # the PRIMARY platform decides: jax_platforms is a priority list and
    # plugins commonly register as "<tpu-plugin>,cpu" — substring-testing
    # the whole string routed every TPU process into the host-keyed CPU
    # dir (found round 5: the shared TPU dir sat empty while TPU
    # executables accumulated under xla_cache_cpu_<host>)
    primary = (platforms or "").split(",")[0].strip()
    if primary == "cpu":
        return os.path.join(base, "xla_cache_cpu_" + host_fingerprint())
    return os.path.join(base, "xla_cache")


_configured_cache_dir: str | None = None


def init_jax_defaults() -> None:
    global _configured_cache_dir
    import jax

    if os.environ.get("GINFINITY_NO_XLA_CACHE") == "1":
        # opt-out (the multichip dryrun uses it: CPU AOT cache entries
        # are host-specific and warn/SIGILL on reload)
        return
    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        platforms = getattr(jax.config, "jax_platforms", None) or os.environ.get(
            "JAX_PLATFORMS"
        )
        cache_dir = _default_cache_dir(platforms)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache everything, even fast compiles
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
            _configured_cache_dir = cache_dir
        except Exception:  # pragma: no cover - cache is best-effort
            pass


def _fix_cache_dir_for_backend() -> None:
    """Late correction for processes that force the CPU platform AFTER
    importing this package (init_jax_defaults then saw the TPU default):
    once the backend is actually up, move the cache out of the shared
    TPU dir so host-specific CPU entries never pollute it."""
    global _configured_cache_dir
    if _configured_cache_dir is None:
        return
    try:
        import jax

        right_dir = _default_cache_dir(jax.default_backend())
        if right_dir != _configured_cache_dir:
            os.makedirs(right_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", right_dir)
            _configured_cache_dir = right_dir
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_prewarm_threads: list = []

# Foreground-priority gate for background compiles.  This host has ONE
# CPU: a speculative prewarm compile running concurrently with a
# foreground stage's own compiles/dispatch starves the foreground
# (measured: library-mode posteriors 18.6 s vs 4.2 s without the
# contention — BASELINE.md).  The gate is OPEN by default (standalone
# callers like ginfinity-prewarm want compiles to start immediately);
# a pipeline closes it at entry and reopens it once its own
# compile-heavy leading stage has finished, so prewarm work overlaps
# the device-bound middle stages instead.
import threading as _threading  # noqa: E402

_prewarm_gate = _threading.Event()
_prewarm_gate.set()


def hold_prewarm() -> None:
    """Close the gate: background prewarm threads pause before their
    next program until :func:`release_prewarm` (or a stop event)."""
    _prewarm_gate.clear()


def release_prewarm() -> None:
    _prewarm_gate.set()


def prewarm_gate_wait(stop_event=None, poll: float = 0.25,
                      max_wait: float = 900.0) -> bool:
    """Block until the gate is open.  Returns False if ``stop_event``
    fired first (the caller should skip its remaining programs).
    ``max_wait`` bounds the hold in case a pipeline's error path never
    reopens the gate — after it, proceed rather than hang."""
    waited = 0.0
    while not _prewarm_gate.wait(timeout=poll):
        if stop_event is not None and stop_event.is_set():
            return False
        waited += poll
        if waited >= max_wait:
            return True
    return True


def register_prewarm_thread(t, stop_event=None) -> None:
    """Track a background compile/prewarm thread so process exit JOINS
    it instead of the interpreter killing it mid-XLA-compile (daemon
    threads cancelled inside the compiler abort the process with
    'FATAL: exception not rethrown').  Only register threads whose work
    is bounded (program compiles/loads) — NOT the backend warmup probe,
    which can stall for minutes on a dead tunnel.

    ``stop_event``: optional threading.Event the worker checks between
    programs.  Exit (and stop_prewarm_threads) sets it so the thread
    skips programs it has not started instead of compiling them while
    the process tries to leave; the in-flight compile still completes
    (committing it to the persistent XLA cache for future runs)."""
    _prewarm_threads.append((t, stop_event))


def stop_prewarm_threads() -> None:
    """Ask every registered prewarm thread to skip its not-yet-started
    programs (pipelines call this once the stage the prewarm serves has
    finished — any remaining speculative compile is pure waste)."""
    for _, ev in _prewarm_threads:
        if ev is not None:
            ev.set()


def _join_prewarm_threads() -> None:  # pragma: no cover - exit path
    stop_prewarm_threads()
    import sys

    for t, _ in _prewarm_threads:
        if t.is_alive():
            print(
                "[ginfinity] waiting for an in-flight background program "
                "compile to finish (persists it for future runs)...",
                file=sys.stderr,
            )
            t.join(timeout=120)


import atexit  # noqa: E402  (registration, not a top-of-file import)

atexit.register(_join_prewarm_threads)


_warmup_thread = None
last_warmup_secs: float | None = None


def start_backend_warmup():
    """Bring the device backend up on a background thread.

    The first device op of a fresh process pays the full backend/session
    bring-up (20-35 s over a remote-TPU tunnel) — and when the first op
    is a LARGE program, its first execution degrades far worse (measured
    147 s for the first window-ladder fetch cold vs ~1 s for the same
    fetch after a trivial op).  Kicking a trivial op on a daemon thread
    at pipeline entry overlaps the bring-up with host preprocessing;
    call :func:`join_backend_warmup` before the first real dispatch.

    Idempotent; safe to call from any pipeline."""
    global _warmup_thread
    if _warmup_thread is None:
        import threading

        def _probe():
            global last_warmup_secs
            t0 = time.perf_counter()
            try:
                import numpy as np

                import jax.numpy as jnp

                np.asarray(jnp.zeros(8) + 1)
                _fix_cache_dir_for_backend()
            except Exception:  # pragma: no cover - warmup is best-effort
                pass
            last_warmup_secs = time.perf_counter() - t0

        _warmup_thread = threading.Thread(
            target=_probe, name="ginfinity-backend-warmup", daemon=True
        )
        _warmup_thread.start()
    return _warmup_thread


def join_backend_warmup() -> None:
    """Wait for the warmup probe, with a stall watchdog.

    The shared remote-TPU tunnel has a degraded-tail state where session
    establishment itself stalls for minutes (measured 64-491 s for a
    trivial first op; BASELINE.md cold-start section).  Nothing in user
    code can restart the tunnel, but silence here makes the stall look
    like a pipeline hang — so after ``GINFINITY_WARMUP_WARN_SECS``
    (default 30) the watchdog says what is actually happening, repeats
    every interval, and reports the total once the session comes up."""
    if _warmup_thread is None:
        return
    try:
        warn_after = float(os.environ.get("GINFINITY_WARMUP_WARN_SECS", "30"))
    except ValueError:
        warn_after = 30.0
    # a zero/negative value would busy-loop the join + warning spam
    warn_after = max(warn_after, 1.0)
    t0 = time.perf_counter()
    warned = False
    while True:
        _warmup_thread.join(timeout=warn_after)
        if not _warmup_thread.is_alive():
            break
        warned = True
        print(
            f"[WARN] device session establishment is stalled "
            f"({time.perf_counter() - t0:.0f}s and counting) — this is "
            f"remote-TPU tunnel congestion, not the pipeline; it will "
            f"resume on its own. (GINFINITY_WARMUP_WARN_SECS={warn_after:g})",
            flush=True,
        )
    if warned:
        print(
            f"[WARN] device session up after "
            f"{time.perf_counter() - t0:.0f}s; throughput this run may be "
            f"transport-degraded.",
            flush=True,
        )
