"""Process-level JAX runtime setup shared by the CLI entry points.

The persistent compilation cache matters a lot in this stack: the
full-scale train/behavior programs take minutes to build (the TPU compile
service round-trip dominates), and the cache drops warm-start to seconds.
bench.py and the profiling scripts already enabled it ad hoc; the training
CLIs route through here so every entry point gets the same behavior.
"""

import os
import signal


class GracefulShutdown:
    """Cooperative SIGTERM/SIGINT handling for training loops.

    Production TPU-VM jobs are preempted with SIGTERM (maintenance events,
    spot reclaims); the reference has no failure-detection story at all
    (SURVEY §5 "Failure detection: none").  Entering this context installs
    handlers that set ``.requested`` instead of killing the process; the
    training loop polls the flag once per iteration, writes a final
    checkpoint and returns cleanly, so the run is resumable from the exact
    step it was interrupted at (``--resume``).

    A second SIGINT falls through to the original handler (normally
    ``KeyboardInterrupt``) so an interactive user can still force-stop a
    run that is stuck before reaching the poll point.

    Signal handlers can only be installed from the main thread; elsewhere
    (e.g. a test harness driving ``train()`` from a worker thread) the
    context degrades to a plain no-op flag.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._prev = {}
        self.requested = False

    def _handler(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            prev = self._prev.get(signum)
            if callable(prev):
                return prev(signum, frame)
            raise KeyboardInterrupt
        self.requested = True

    def __enter__(self):
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handler)
        except ValueError:  # not in the main thread
            self._prev = {}
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        return False


def _cpu_host_tag() -> str:
    """Fingerprint of the host CPU microarchitecture (ISA feature set).

    JAX's CPU cache key does not include the compile machine's features, so
    an ``.jax_cache`` shared across container hosts (this repo persists
    while the underlying machine changes between sessions) serves AOT
    results built for a *different* CPU — jaxlib logs a feature-mismatch
    error per load and warns of possible SIGILL.  Scoping the CPU cache by
    this tag makes entries host-local.
    """
    import hashlib
    import platform

    tag = platform.machine() or "unknown"
    try:
        flags = model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not flags and line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    # the model name matters beyond the flag set: XLA picks
                    # LLVM *tuning* features (e.g. prefer-no-scatter) from
                    # the detected CPU model, so two hosts with identical
                    # flag sets can still produce mismatched AOT entries
                    # (observed round 4: per-load feature-mismatch errors)
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
        if flags or model:
            h = hashlib.sha1(f"{model}|{flags}".encode()).hexdigest()[:10]
            return f"{tag}-{h}"
    except OSError:
        pass
    return tag


def enable_persistent_cache(min_compile_secs: float = 1.0,
                            root: str = None) -> str:
    """Point JAX's compilation cache at ``<repo>/.jax_cache/<backend…>``
    (gitignored).

    Scoped per backend: TPU programs are compiled remotely, so their cache
    entries are host-independent and shared (``tpu/``); CPU entries are
    host-specific AOT code, scoped by a CPU-feature fingerprint
    (``cpu-<tag>/``) so a cache carried across different container hosts
    never serves mismatched machine code (see :func:`_cpu_host_tag`).

    Must run before the first compilation (all CLI entry points call it at
    startup, after any platform selection); safe to call more than once.
    Returns the cache directory.
    """
    import jax

    backend = jax.default_backend()
    sub = f"cpu-{_cpu_host_tag()}" if backend == "cpu" else backend
    if root is None:
        root = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        )
    cache_dir = os.path.join(root, sub)
    if backend != "cpu":
        # one-time migration of pre-scoping entries from the cache root:
        # keys embed the platform, so mis-homed CPU blobs are never served
        # to TPU lookups — while the (expensive, remotely-compiled) TPU
        # entries stay warm
        try:
            os.makedirs(cache_dir, exist_ok=True)
            for name in os.listdir(root):
                src = os.path.join(root, name)
                if name.endswith("-cache") and os.path.isfile(src):
                    os.replace(src, os.path.join(cache_dir, name))
        except OSError:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
