"""Resume with bundled env state (EXTENSION over the reference).

The reference checkpoints learner state only (on_policy_runner.py:278-287;
SURVEY §5 'env/curriculum/RNG state is NOT checkpointed'), so resuming a
curriculum run re-spreads terrain levels and the reward dips. Our final
checkpoint bundles the full env-state pytree + matching obs; load()
restores them when the env shape matches and skips gracefully otherwise
(e.g. play.py's 1-env eval loading a 4096-env training ckpt).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_terrain_cfgs():
    from humanoid_gym_tpu.config.xbotl import XBotLCfg, XBotLCfgPPO

    cfg = XBotLCfg()
    cfg.env.num_envs = 8
    cfg.terrain.mesh_type = "trimesh"
    cfg.terrain.curriculum = True
    cfg.terrain.num_rows = 4
    cfg.terrain.num_cols = 4
    cfg.terrain.max_init_terrain_level = 3
    cfg.terrain.terrain_length = 5.0
    cfg.terrain.terrain_width = 5.0
    tcfg = XBotLCfgPPO()
    tcfg.runner.num_steps_per_env = 2
    tcfg.runner.save_interval = 100
    tcfg.algorithm.num_mini_batches = 2
    tcfg.algorithm.num_learning_epochs = 1
    return cfg, tcfg


@pytest.mark.slow
def test_env_state_survives_resume(tmp_path):
    from humanoid_gym_tpu.envs import make_env
    from humanoid_gym_tpu.runner import OnPolicyRunner

    cfg, tcfg = _tiny_terrain_cfgs()
    env = make_env(cfg)

    run_a = OnPolicyRunner(env, tcfg, log_dir=str(tmp_path / "a"), seed=5)
    run_a.learn(2)
    levels_a = np.asarray(run_a.env_state.terrain_level)
    qpos_a = np.asarray(run_a.env_state.phys.qpos)
    obs_a = np.asarray(run_a.obs)
    assert levels_a.max() > 0  # init spread actually produced levels

    ckpts = sorted(glob.glob(str(tmp_path / "a" / "model_*.ckpt")))
    assert ckpts

    run_b = OnPolicyRunner(env, tcfg, log_dir=None, seed=123)
    # different seed -> different fresh state, so a real restore is visible
    assert not np.allclose(np.asarray(run_b.env_state.phys.qpos), qpos_a)
    run_b.load(ckpts[-1])
    np.testing.assert_array_equal(
        np.asarray(run_b.env_state.terrain_level), levels_a
    )
    np.testing.assert_allclose(np.asarray(run_b.env_state.phys.qpos), qpos_a)
    np.testing.assert_allclose(np.asarray(run_b.obs), obs_a)


@pytest.mark.slow
def test_env_state_skipped_on_shape_mismatch(tmp_path, capsys):
    """A differently-sized eval runner (play.py pattern: eval at a
    different env count) loading a bundled training ckpt must keep its
    own env state rather than crash or silently adopt a wrong-shaped
    one."""
    from humanoid_gym_tpu.envs import make_env
    from humanoid_gym_tpu.runner import OnPolicyRunner

    cfg, tcfg = _tiny_terrain_cfgs()
    env = make_env(cfg)
    run_a = OnPolicyRunner(env, tcfg, log_dir=str(tmp_path / "a"), seed=5)
    run_a.learn(2)
    ckpt = sorted(glob.glob(str(tmp_path / "a" / "model_*.ckpt")))[-1]

    cfg1, tcfg1 = _tiny_terrain_cfgs()
    cfg1.env.num_envs = 16  # != the ckpt's 8 (divisible by the test mesh)
    env1 = make_env(cfg1)
    run_c = OnPolicyRunner(env1, tcfg1, log_dir=None, seed=5)
    qpos_c = np.asarray(run_c.env_state.phys.qpos)
    run_c.load(ckpt)
    assert np.asarray(run_c.env_state.phys.qpos).shape == qpos_c.shape
    # params DID load
    assert run_c.current_learning_iteration == run_a.current_learning_iteration


@pytest.mark.slow
def test_ckpt_records_and_honors_compute_dtype(tmp_path, capsys):
    """Checkpoints pin the RESOLVED net compute dtype (ADVICE r4): a run
    trained under one resolution must not silently continue under another
    when 'auto' resolves differently on the loading backend."""
    from humanoid_gym_tpu.envs import make_env
    from humanoid_gym_tpu.runner import OnPolicyRunner

    cfg, tcfg = _tiny_terrain_cfgs()
    env = make_env(cfg)
    run_a = OnPolicyRunner(env, tcfg, log_dir=str(tmp_path / "a"), seed=5)
    run_a.learn(1)
    ckpt = sorted(glob.glob(str(tmp_path / "a" / "model_*.ckpt")))[-1]

    from flax import serialization

    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    # on CPU "auto" resolves to float32 and the ckpt records it
    assert payload["compute_dtype"] == "float32"

    # simulate a ckpt trained where auto resolved the OTHER way
    run_b = OnPolicyRunner(env, tcfg, log_dir=None, seed=1)
    run_b._honor_ckpt_dtype("bfloat16")
    assert run_b.net.compute_dtype == "bfloat16"  # honored: auto config

    # an explicit per-task pin wins over the recorded dtype
    tcfg2 = _tiny_terrain_cfgs()[1]
    tcfg2.policy.compute_dtype = "float32"
    run_c = OnPolicyRunner(env, tcfg2, log_dir=None, seed=1)
    run_c._honor_ckpt_dtype("bfloat16")
    assert run_c.net.compute_dtype == "float32"
    assert "WARNING" in capsys.readouterr().out

    # matching dtype: no rebuild
    run_d = OnPolicyRunner(env, tcfg, log_dir=None, seed=1)
    it = run_d._train_iter
    run_d._honor_ckpt_dtype("float32")
    assert run_d._train_iter is it
