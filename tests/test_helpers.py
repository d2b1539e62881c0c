"""Tests for CLI/config/checkpoint-discovery utilities."""

import os
import time

import pytest

from humanoid_gym_tpu.config.xbotl import XBotLCfg
from humanoid_gym_tpu.utils.helpers import (
    class_to_dict,
    get_args,
    get_load_path,
    update_cfg_from_args,
    update_class_from_dict,
)


def test_get_args_defaults():
    a = get_args([])
    assert a.task == "humanoid_ppo"
    assert a.checkpoint == -1 and a.load_run is None and not a.resume


def test_update_cfg_from_args():
    from humanoid_gym_tpu.config.xbotl import XBotLCfgPPO

    env_cfg = XBotLCfg()
    train_cfg = XBotLCfgPPO()
    a = get_args(
        ["--num_envs", "64", "--seed", "9", "--max_iterations", "42", "--resume"]
    )
    update_cfg_from_args(env_cfg, train_cfg, a)
    assert env_cfg.env.num_envs == 64
    assert train_cfg.seed == 9
    assert train_cfg.runner.max_iterations == 42
    assert train_cfg.runner.resume


def test_class_dict_roundtrip():
    cfg = XBotLCfg()
    d = class_to_dict(cfg)
    assert d["rewards"]["scales"]["joint_pos"] == 1.6
    update_class_from_dict(cfg, {"rewards": {"scales": {"joint_pos": 2.5}}})
    assert cfg.rewards.scales.joint_pos == 2.5


def test_get_load_path(tmp_path):
    # two runs; later mtime wins; checkpoint numbering honored
    r1 = tmp_path / "May01_old"
    r2 = tmp_path / "Jun02_new"
    r1.mkdir()
    r2.mkdir()
    (r1 / "model_100.ckpt").write_bytes(b"x")
    (r2 / "model_50.ckpt").write_bytes(b"x")
    (r2 / "model_200.ckpt").write_bytes(b"x")
    os.utime(r1, (time.time() - 100, time.time() - 100))
    p = get_load_path(str(tmp_path))
    assert p.endswith("Jun02_new/model_200.ckpt")
    p = get_load_path(str(tmp_path), load_run="May01_old")
    assert p.endswith("May01_old/model_100.ckpt")
    p = get_load_path(str(tmp_path), checkpoint=50)
    assert p.endswith("Jun02_new/model_50.ckpt")
    with pytest.raises(ValueError):
        get_load_path(str(tmp_path / "nope")) if (tmp_path / "nope").mkdir() is None else None


def test_gait_coefficients():
    import numpy as np

    from humanoid_gym_tpu.utils.calculate_gait import (
        H_SWING,
        T_SWING,
        evaluate,
        get_coefficients,
    )

    c = get_coefficients()
    np.testing.assert_allclose(evaluate(c, np.asarray(0.0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(evaluate(c, np.asarray(T_SWING)), 0.0, atol=1e-9)
    np.testing.assert_allclose(
        evaluate(c, np.asarray(T_SWING / 2)), H_SWING, atol=1e-9
    )
