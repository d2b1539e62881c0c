"""Engine-fidelity capstone: the REFERENCE's shipped policy walks in OUR engine.

The inverse of tests/test_export_sim2sim.py::test_sim2sim_reference_policy_walks
(our policy in MuJoCo): load the reference's pretrained TorchScript actor
(/root/reference/logs/XBot_ppo/exported/policies/policy_example.pt — trained
entirely in Isaac Gym PhysX, reference helpers.py:248-253) and roll it
closed-loop in the JAX physics engine on flat ground at cmd vx=0.4.

If our contact/dynamics/PD/observation stack matches what XBot policies
expect, a policy that has never seen our engine must balance and track the
command. This is the sharpest single check that the first-party physics
reproduces the reference's native simulation (VERDICT round 2, next-round
item 4).
"""

import os

import numpy as np
import pytest

REF_POLICY = "/root/reference/logs/XBot_ppo/exported/policies/policy_example.pt"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(REF_POLICY), reason="no reference artifact")
def test_reference_policy_walks_in_our_engine():
    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu import registry
    from humanoid_gym_tpu.export.policy_export import load_policy

    policy = load_policy(REF_POLICY)

    def overrides(cfg):
        # deployment-clean setup (reference play.py:51-63): flat, no DR, no
        # noise, no pushes — the policy sees exactly the actor obs contract
        cfg.env.num_envs = 1
        cfg.terrain.mesh_type = "plane"
        cfg.terrain.curriculum = False
        cfg.noise.add_noise = False
        cfg.domain_rand.push_robots = False
        cfg.domain_rand.randomize_friction = False
        cfg.domain_rand.randomize_base_mass = False
        cfg.domain_rand.action_delay = 0.0
        cfg.domain_rand.action_noise = 0.0
        cfg.commands.heading_command = False

    env, _ = registry.make_env("humanoid_ppo", num_envs=1, cfg_overrides=overrides)
    state, obs, _ = env.reset_all(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    cmd = jnp.asarray([[0.4, 0.0, 0.0, 0.0]])

    n_steps = 400  # 4 s at 100 Hz
    fell = None
    x0 = float(state.phys.qpos[0, 0])
    vxs = []
    for i in range(n_steps):
        state = state.replace(commands=cmd)
        action = policy(np.asarray(obs)[0])[None]
        state, tr = step(state, jnp.asarray(action, jnp.float32))
        obs = tr.obs
        if bool(tr.done[0]) and not bool(tr.time_out[0]):
            fell = i * env.dt
            break
        vxs.append(float(state.base_lin_vel[0, 0]))

    assert fell is None, f"reference policy fell at {fell:.2f}s in our engine"
    dist = float(state.phys.qpos[0, 0]) - x0
    # 0.4 m/s * 4 s = 1.6 m ideal; require >= 50% tracking — the same gate
    # the hfield standings use (scripts/eval_hfield.py TRACK_GATE)
    assert dist >= 0.8, f"reference policy only walked {dist:.2f} m of 1.6 m"
    # and it should actually be walking, not sliding: mean vx in a sane band
    assert 0.15 <= np.mean(vxs) <= 0.7, f"mean vx {np.mean(vxs):.2f}"
