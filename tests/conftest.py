"""Test configuration: CPU backend with 8 virtual devices.

Tests never require TPU hardware; multi-chip sharding is validated on an
emulated 8-device CPU mesh (SURVEY.md §4 test strategy).
"""

import os

# Force CPU regardless of ambient configuration (the axon TPU platform is
# reserved for bench.py; tests emulate a mesh on host).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# The axon TPU harness pins jax_platforms via jax.config at interpreter
# start (sitecustomize), so the env var alone is not enough — override the
# config directly before any computation.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def xbot_model():
    from humanoid_gym_tpu.physics.model import build_xbot_model

    return build_xbot_model()


@pytest.fixture(scope="session")
def mj_oracle(xbot_model):
    """MuJoCo model/data built from the engine's own RobotModel."""
    import mujoco

    from humanoid_gym_tpu.physics.mjcf_export import model_to_mjcf

    mj = mujoco.MjModel.from_xml_string(model_to_mjcf(xbot_model))
    return mj


def random_state(rng, scale_q=0.5, scale_v=0.5):
    qj = rng.uniform(-scale_q, scale_q, 12)
    quat = rng.normal(size=4)
    quat /= np.linalg.norm(quat)
    pos = rng.uniform(-1, 1, 3) + np.array([0.0, 0.0, 1.0])
    qvel = rng.normal(size=18) * scale_v
    return pos, quat, qj, qvel
