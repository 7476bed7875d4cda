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


def enable_persistent_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX's compilation cache at ``<repo>/.jax_cache`` (gitignored).

    Must run before the first compilation; safe to call more than once.
    Returns the cache directory.
    """
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return cache_dir
