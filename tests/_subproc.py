"""Run one sharded-EXECUTION case (tests/sharded_cases.py) in a fresh
subprocess with a bounded wall clock.

Each case gets its own process and virtual-device platform so (a) no
interference from earlier executions' thread pools is possible and (b) a
future execution pathology FAILS the suite at ``timeout`` seconds instead
of hanging it (the round-3 wedge diagnosis lives in sharded_cases.py's
module docstring).
"""

import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def run_case(name: str, ndev: int = None, timeout: int = 900):
    env = dict(os.environ)
    # the case sets its own platform/device count; drop the parent suite's
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "tests", "sharded_cases.py"),
           name]
    if ndev is not None:
        cmd.append(str(ndev))
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env, cwd=REPO)
    except subprocess.TimeoutExpired as e:
        raise AssertionError(
            f"sharded case {name!r} exceeded {timeout}s (the 1-core wedge "
            f"guard); partial output:\n"
            f"{(e.stdout or b'').decode(errors='replace')[-3000:]}\n"
            f"{(e.stderr or b'').decode(errors='replace')[-3000:]}") from None
    assert p.returncode == 0, (
        f"sharded case {name!r} failed (rc={p.returncode}):\n"
        f"{p.stdout[-3000:]}\n{p.stderr[-3000:]}")
    return p.stdout
