"""Pure helpers of the perf harnesses (scripts/): argument parsing and the
shared synthetic-buffer fill, so harness plumbing regressions surface in
the suite instead of mid-benchmark on the TPU."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from bench_scaling import parse_meshes  # noqa: E402
from sweep_perf import _parse_xla_spec  # noqa: E402


def test_parse_meshes():
    assert parse_meshes("1x1") == [(1, 1)]
    assert parse_meshes("2x1,4X2,8x1") == [(2, 1), (4, 2), (8, 1)]


def test_parse_xla_spec_coercion():
    out = _parse_xla_spec(
        "xla_a=48,xla_b=true,xla_c=false,xla_d=1.5,xla_e=enabled:true")
    assert out == {"xla_a": 48, "xla_b": True, "xla_c": False,
                   "xla_d": 1.5, "xla_e": "enabled:true"}
    assert _parse_xla_spec("") == {}


def test_fill_synthetic_buffer(tiny_cfg):
    from _profiling_common import fill_synthetic_buffer

    from multimodal_rssm_tpu.data.buffer import build_buffer

    D = fill_synthetic_buffer(build_buffer(tiny_cfg), tiny_cfg,
                              episodes=2, ep_len=30)
    assert D.steps == 60 and D.episodes == 2
    # episode boundary encoded as nonterminal 0 at each episode's last row
    assert D.nonterminals[29, 0] == 0.0 and D.nonterminals[59, 0] == 0.0
    assert D.nonterminals[:29].all()
    obs, act, rew, nt = D.sample(2, 4)
    for v in obs.values():
        assert v.shape[:2] == (4, 2)
    assert np.isfinite(rew).all()
