"""Model-server tests (io/serve.py): HTTP round-trips over exported
artifacts reproduce the direct artifact calls exactly.

The server completes the deployment story the reference lacks entirely
(its inference lives in check_model.ipynb against live torch modules):
export -> *.jaxexport -> HTTP npz protocol, callable from any language.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_rssm_tpu.io import export as ex
from multimodal_rssm_tpu.io import serve as sv
from multimodal_rssm_tpu.models.world_model import WorldModel
from multimodal_rssm_tpu.train import trainer as tr


def test_flatten_unflatten_roundtrip():
    tree = {"a": np.ones((2,)), "b": {"c": np.zeros((1, 3)),
                                      "d": np.arange(4)}}
    flat = sv.flatten_tree(tree)
    assert set(flat) == {"a", "b.c", "b.d"}
    back = sv.unflatten_tree(flat)
    np.testing.assert_array_equal(back["b"]["c"], tree["b"]["c"])
    np.testing.assert_array_equal(back["a"], tree["a"])


@pytest.fixture(scope="module")
def served(tiny_cfg, tiny_buffer, tmp_path_factory):
    """Export a tiny filter_step + decode, then a live server over them."""
    model = WorldModel.from_config(tiny_cfg)
    spec = tr.build_aug_spec(tiny_buffer)
    key = jax.random.PRNGKey(0)
    obs, act, rew, nt = tiny_buffer.sample(2, 6)
    prep = tr.prepare_observations(
        {k: jnp.asarray(v) for k, v in obs.items()}, spec,
        tr.HostAugmentDraws(tiny_buffer, spec).draw(),
        int(tiny_cfg.env.bit_depth), key,
    )
    obs_target = {k: v[1:] for k, v in prep.items()}
    variables = model.init(key, obs_target, jnp.asarray(act)[:-1],
                           jnp.asarray(nt)[:-1], key, train=False)

    art_dir = tmp_path_factory.mktemp("artifacts")
    ex.save_exported(ex.export_filter_step(tiny_cfg, model, variables, 1),
                     str(art_dir / "filter_step.jaxexport"))
    ex.save_exported(ex.export_decode(tiny_cfg, model, variables, 1),
                     str(art_dir / "decode.jaxexport"))

    httpd = sv.make_server(str(art_dir), port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield tiny_cfg, model, str(art_dir), url
    httpd.shutdown()
    httpd.server_close()


def _post_npz(url: str, arrays: dict) -> dict:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        url, data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=120) as r:
        body = r.read()
    with np.load(io.BytesIO(body)) as z:
        return {k: z[k] for k in z.files}


def _filter_inputs(cfg, model, seed=0):
    rng = np.random.default_rng(seed)
    arrays = {
        "h": np.zeros((1, model.belief_size), np.float32),
        "s": np.zeros((1, model.state_size), np.float32),
        "action": np.zeros((1, int(cfg.env.action_size)), np.float32),
        "nonterminal": np.ones((1, 1), np.float32),
        "key": np.asarray(jax.random.key_data(jax.random.PRNGKey(3))),
    }
    for name in cfg.rssm.observation_names_enc:
        c, h, w = (tuple(cfg.env.observation_shapes[name]) + (None, None))[:3]
        if "image" in name:
            arrays[f"obs.{name}"] = rng.integers(
                0, 256, (1, h, w, c), dtype=np.uint8)
        else:
            shape = tuple(cfg.env.observation_shapes[name])
            arrays[f"obs.{name}"] = rng.normal(
                size=(1, *shape)).astype(np.float32)
    return arrays


def test_healthz_and_info(served):
    _, _, _, url = served
    with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
        assert json.load(r) == {"status": "ok"}
    with urllib.request.urlopen(url + "/v1/info", timeout=30) as r:
        info = json.load(r)
    assert set(info) == {"filter_step", "decode"}
    assert info["filter_step"]["arg_names"][0] == "h"
    assert info["filter_step"]["in_avals"]
    assert info["filter_step"]["platforms"]


def test_serve_filter_step_matches_direct_call(served):
    """HTTP round-trip == direct artifact call, bit for bit."""
    cfg, model, art_dir, url = served
    arrays = _filter_inputs(cfg, model)
    out = _post_npz(url + "/v1/call/filter_step", arrays)

    exp = ex.load_exported(art_dir + "/filter_step.jaxexport")
    obs = {k[len("obs."):]: v for k, v in arrays.items()
           if k.startswith("obs.")}
    ref = exp.call(arrays["h"], arrays["s"], arrays["action"], obs,
                   arrays["nonterminal"], arrays["key"])
    assert out["beliefs"].shape == (1, model.belief_size)
    for k in ("beliefs", "posterior_states", "posterior_means"):
        np.testing.assert_array_equal(out[k], np.asarray(ref[k]))


def test_serve_streaming_carry(served):
    """The stateless protocol carries (belief, state) across calls."""
    cfg, model, _, url = served
    arrays = _filter_inputs(cfg, model, seed=1)
    states = []
    for t in range(3):
        arrays.update(_filter_inputs(cfg, model, seed=10 + t))
        out = _post_npz(url + "/v1/call/filter_step", arrays)
        arrays["h"], arrays["s"] = out["beliefs"], out["posterior_states"]
        states.append(out["posterior_states"])
    assert all(np.isfinite(s).all() for s in states)
    assert not np.allclose(states[0], states[2])

    # decode the final carry
    dec = _post_npz(url + "/v1/call/decode",
                    {"h": arrays["h"], "s": arrays["s"]})
    rec_keys = [k for k in dec if k.endswith(".loc")]
    assert rec_keys and all(np.isfinite(dec[k]).all() for k in rec_keys)


def test_serve_errors(served):
    _, _, _, url = served
    # unknown artifact -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npz(url + "/v1/call/nope", {"h": np.zeros(1)})
    assert ei.value.code == 400
    assert "unknown artifact" in json.load(ei.value)["error"]
    # missing inputs -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_npz(url + "/v1/call/filter_step", {"h": np.zeros(1)})
    assert ei.value.code == 400
    assert "missing inputs" in json.load(ei.value)["error"]
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url + "/v1/what", timeout=30)
    assert ei.value.code == 404
