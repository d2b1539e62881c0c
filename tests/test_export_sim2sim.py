"""Export + MuJoCo sim2sim path tests (BASELINE config[0]: CPU-runnable e2e).

Uses the reference's shipped pretrained TorchScript actor as an oracle input
(logs/XBot_ppo/exported/policies/policy_example.pt) to prove the deployment
loop reproduces a working gait, and round-trips our own export formats.
"""

import os

import numpy as np
import pytest

REF_POLICY = "/root/reference/logs/XBot_ppo/exported/policies/policy_example.pt"
from humanoid_gym_tpu import XBOT_MJCF  # noqa: E402


def test_numpy_policy_roundtrip(tmp_path):
    """flax params -> npz -> NumpyPolicy == flax actor output."""
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.export.policy_export import export_policy, load_policy

    net = ActorCritic(num_actions=12)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 705)), jnp.zeros((1, 219)))
    files = export_policy(jax.device_get(params), str(tmp_path), torchscript=True)
    pol = load_policy(files[0])
    obs = np.random.default_rng(0).normal(size=705).astype(np.float32)
    ours = pol(obs)
    ref = np.asarray(net.apply(params, obs[None], method=ActorCritic.act_inference))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # TorchScript artifact parity, if written
    ts = [f for f in files if f.endswith(".pt")]
    if ts:
        pol_ts = load_policy(ts[0])
        np.testing.assert_allclose(pol_ts(obs), ref, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_POLICY), reason="no reference artifact")
def test_sim2sim_reference_policy_walks():
    """The reference pretrained policy must walk in our MuJoCo loop —
    validates the deployment obs contract byte-for-byte (sim2sim.py:124-148).
    Short horizon (5 s) to keep CI fast; falling reads as height collapse."""
    from humanoid_gym_tpu.export.policy_export import load_policy
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

    policy = load_policy(REF_POLICY)
    cfg = Sim2SimCfg(mujoco_model_path=XBOT_MJCF, sim_duration=5.0)
    out = run_mujoco(policy, cfg)
    assert out["fallen_at_s"] is None, f"robot fell: {out}"
    assert out["mean_height"] > 0.8
    # commanded vx=0.4: expect forward progress
    assert out["distance_x"] > 0.5, f"no forward walk: {out}"


def test_checkpoint_roundtrip(tmp_path):
    """Save/load restores params + optimizer + lr exactly."""
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import init_train_state
    from flax import serialization

    net = ActorCritic(num_actions=12)
    ts = init_train_state(jax.random.PRNGKey(0), net, 705, 219, 1e-5)
    ts = ts.replace(lr=jnp.asarray(3e-4), iteration=jnp.asarray(7))
    payload = {"train_state": serialization.to_state_dict(jax.device_get(ts)), "iter": 7}
    p = tmp_path / "model_7.ckpt"
    p.write_bytes(serialization.msgpack_serialize(payload))
    restored = serialization.from_state_dict(
        jax.device_get(ts), serialization.msgpack_restore(p.read_bytes())["train_state"]
    )
    assert float(restored.lr) == pytest.approx(3e-4)
    assert int(restored.iteration) == 7
    a = jax.tree.leaves(ts.params)
    b = jax.tree.leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(not os.path.exists(REF_POLICY), reason="no reference artifact")
def test_native_eval_farm():
    """C++ batch evaluator: reference policy must walk in parallel rollouts
    (independent reimplementation of the deployment obs contract)."""
    import shutil

    import torch

    from humanoid_gym_tpu.export.native_eval import run_eval_farm

    if shutil.which("make") is None:
        pytest.skip("no make")
    # convert the reference TorchScript actor to the flat bin format
    mod = torch.jit.load(REF_POLICY, map_location="cpu")
    ws = {n: p.detach().numpy() for n, p in mod.named_parameters()}
    idxs = sorted({int(n.split(".")[0]) for n in ws})
    import tempfile

    d = tempfile.mkdtemp()
    bin_path = os.path.join(d, "policy.bin")
    with open(bin_path, "wb") as f:
        f.write(b"HGTP")
        f.write(np.asarray([len(idxs)], np.int32).tobytes())
        for i in idxs:
            W = ws[f"{i}.weight"].T
            b = ws[f"{i}.bias"]
            f.write(np.asarray(W.shape, np.int32).tobytes())
            f.write(np.ascontiguousarray(W, np.float32).tobytes())
            f.write(np.ascontiguousarray(b, np.float32).tobytes())

    out = run_eval_farm(XBOT_MJCF, bin_path, rollouts=4, duration=3.0)
    assert out["summary"]["survived"] == 4, out
    assert out["summary"]["mean_distance_x"] > 0.5, out


def test_shipped_demo_policy_walks():
    """The shipped demo artifact must keep walking in MuJoCo (guards the
    checked-in policy + the whole deployment contract)."""
    demo = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources", "policies", "xbotl_walk_demo.npz",
    )
    if not os.path.exists(demo):
        pytest.skip("demo artifact not present")
    from humanoid_gym_tpu.export.policy_export import load_policy
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

    cfg = Sim2SimCfg(mujoco_model_path=XBOT_MJCF, sim_duration=5.0)
    out = run_mujoco(load_policy(demo), cfg)
    assert out["fallen_at_s"] is None, out
    assert out["distance_x"] > 0.5, out


def test_sim2sim_terrain_hfield():
    """Terrain variant (reference sim2sim.py:170-183): XBot-L-terrain.xml
    (uneven.png hfield) loads through the MuJoCo 2.3->3.x compat shim and the
    reference pretrained policy survives and makes progress on it — proves
    the hfield asset path end-to-end, plus a gait video from the rollout."""
    import os

    from humanoid_gym_tpu.export.policy_export import load_policy
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

    terrain_mjcf = os.path.join(os.path.dirname(XBOT_MJCF), "XBot-L-terrain.xml")
    policy = load_policy(REF_POLICY)
    cfg = Sim2SimCfg(mujoco_model_path=terrain_mjcf, sim_duration=6.0)
    out = run_mujoco(policy, cfg, video_path="/tmp/hgt_terrain_gait.mp4")
    assert out["fallen_at_s"] is None, f"robot fell on hfield: {out}"
    # hfield raises the effective ground; absolute base height stays ~0.9
    assert out["mean_height"] > 0.7, out
    assert out["distance_x"] > 0.4, f"no forward walk on hfield: {out}"
    assert os.path.getsize(out["video"]) > 10000  # video actually rendered
