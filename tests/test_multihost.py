"""Multi-process (emulated multi-host) training-step test.

Spawns 2 OS processes, each with 4 virtual CPU devices, connected through
jax.distributed — the same code path a TPU pod uses (SURVEY §4(d): emulate a
mesh without TPUs). Each process initializes only its local env block; the
global train step runs sharded over all 8 devices.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
sys.path.insert(0, os.environ["HGT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
import jax.numpy as jnp
from humanoid_gym_tpu.algo.networks import ActorCritic
from humanoid_gym_tpu.algo.ppo import PPOConfig, init_train_state, make_train_iter
from humanoid_gym_tpu.config.xbotl import XBotLCfg
from humanoid_gym_tpu.envs import make_env
from humanoid_gym_tpu.parallel.mesh import make_env_mesh, replicate
from humanoid_gym_tpu.parallel.multihost import assemble_global, host_sharded_env_state

assert jax.process_count() == nproc
assert len(jax.devices()) == 8  # global device count

cfg = XBotLCfg(); cfg.env.num_envs = 16
# production solver through its shard_map dispatch on the distributed mesh
cfg.sim.solver.solver_type = "fused_pallas_interpret"
env = make_env(cfg)
net = ActorCritic(num_actions=12)
ac = PPOConfig(); ac.num_steps_per_env = 2; ac.num_mini_batches = 2; ac.num_learning_epochs = 1

key = jax.random.PRNGKey(0)  # same base key on every process
k_init, k_env, k_it = jax.random.split(key, 3)
ts = init_train_state(k_init, net, 705, 219, ac.learning_rate)
mesh = make_env_mesh()
from humanoid_gym_tpu.physics.pallas_solver import set_solver_mesh
set_solver_mesh(mesh)
state = host_sharded_env_state(env, k_env, mesh)
import numpy as np
obs = assemble_global(np.zeros((8, 705), np.float32), mesh)
priv = assemble_global(np.zeros((8, 219), np.float32), mesh)
ts = replicate(ts, mesh)

train_iter = jax.jit(make_train_iter(env, net, ac, cfg.env.num_envs))
out = train_iter(ts, state, obs, priv, k_it)
vl = float(out[5]["value_loss"])  # fully-replicated scalar
print(f"RESULT pid={pid} value_loss={vl:.6f}", flush=True)

# --- full runner path (host-sharded init, host-0 logging) ---
from humanoid_gym_tpu.config.xbotl import XBotLCfgPPO
from humanoid_gym_tpu.runner import OnPolicyRunner

tcfg = XBotLCfgPPO()
tcfg.runner.num_steps_per_env = 2
tcfg.algorithm.num_mini_batches = 2
tcfg.algorithm.num_learning_epochs = 1
log_dir = os.environ.get("HGT_MH_LOGDIR")
runner = OnPolicyRunner(env, tcfg, log_dir=log_dir)
runner.learn(2, init_at_random_ep_len=True)
print(f"RUNNER_OK pid={pid} rew={runner.rewbuffer and runner.rewbuffer[-1] or 0}", flush=True)

# End-of-test rendezvous: under heavy CPU load the host-0-only logging above
# can leave the processes minutes apart, and the laggard then misses the
# (short) jax.distributed shutdown barrier — the sync has a generous timeout
# and reorders exit to roughly simultaneous.
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("end_of_test")
"""


@pytest.mark.skipif(os.environ.get("HGT_SKIP_MULTIPROC") == "1", reason="opt-out")
@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = "12765"
    envv = dict(os.environ)
    envv["HGT_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    envv["HGT_MH_LOGDIR"] = str(tmp_path / "mh_logs")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=envv,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    import re

    vals = []
    for out in outs:
        m = re.search(r"value_loss=([-\d.]+)", out)
        assert m, out[-2000:]
        vals.append(float(m.group(1)))
    # both hosts must agree on the replicated loss
    assert abs(vals[0] - vals[1]) < 1e-6
    # runner path completed on both hosts; only host 0 wrote logs
    for out in outs:
        assert "RUNNER_OK" in out
    logdir = tmp_path / "mh_logs"
    assert (logdir / "metrics.jsonl").exists()


WORKER_RESUME = r"""
import os, sys, hashlib
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
phase = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
sys.path.insert(0, os.environ["HGT_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
import numpy as np
from humanoid_gym_tpu.config.xbotl import XBotLCfg, XBotLCfgPPO
from humanoid_gym_tpu.envs import make_env
from humanoid_gym_tpu.parallel.multihost import local_env_shard
from humanoid_gym_tpu.runner import OnPolicyRunner

cfg = XBotLCfg(); cfg.env.num_envs = 16
cfg.sim.solver.solver_type = "fused_pallas_interpret"
env = make_env(cfg)
tcfg = XBotLCfgPPO()
tcfg.runner.num_steps_per_env = 2
tcfg.algorithm.num_mini_batches = 2
tcfg.algorithm.num_learning_epochs = 1
log_dir = os.environ["HGT_MH_LOGDIR"]

def shard_hash(runner):
    sh = local_env_shard(runner.env_state)
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(sh):
        h.update(np.ascontiguousarray(leaf).tobytes())
    return h.hexdigest()[:16]

if phase == "train":
    runner = OnPolicyRunner(env, tcfg, log_dir=log_dir)
    runner.learn(2, init_at_random_ep_len=True)
    # learn() closed sinks and wrote model_2.ckpt + .envshard<rank>
    print(f"PHASEA pid={pid} it={runner.current_learning_iteration} "
          f"hash={shard_hash(runner)}", flush=True)
else:  # resume after the processes were torn down ("preemption")
    runner = OnPolicyRunner(env, tcfg, log_dir=log_dir)
    ckpt = os.path.join(log_dir, "model_2.ckpt")
    runner.load(ckpt)
    print(f"PHASEB pid={pid} it={runner.current_learning_iteration} "
          f"hash={shard_hash(runner)}", flush=True)
    # and training continues from the restored state
    runner.learn(1)
    print(f"RESUMED_OK pid={pid}", flush=True)

from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("end_of_test")
"""


@pytest.mark.skipif(os.environ.get("HGT_SKIP_MULTIPROC") == "1", reason="opt-out")
@pytest.mark.slow
def test_two_process_env_state_resume(tmp_path):
    """Pod-safe checkpointing (SURVEY §5 preemption goal): a 2-process run
    saves per-process env shards, the processes are torn down, a FRESH pair
    of processes reassembles the exact env state and keeps training."""
    import re

    script = tmp_path / "worker.py"
    script.write_text(WORKER_RESUME)
    envv = dict(os.environ)
    envv["HGT_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    envv["HGT_MH_LOGDIR"] = str(tmp_path / "mh_logs")

    def run_phase(phase, port):
        procs = [
            subprocess.Popen(
                [sys.executable, str(script), str(i), "2", port, phase],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=envv,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"{phase} proc {i} failed:\n{out[-3000:]}"
        return outs

    outs_a = run_phase("train", "12767")
    # the final ckpt + one env shard per process exist
    logdir = tmp_path / "mh_logs"
    assert (logdir / "model_2.ckpt").exists()
    assert (logdir / "model_2.ckpt.envshard0").exists()
    assert (logdir / "model_2.ckpt.envshard1").exists()

    outs_b = run_phase("resume", "12768")

    def grab(outs, tag):
        got = {}
        for out in outs:
            m = re.search(tag + r" pid=(\d+) it=(\d+) hash=(\w+)", out)
            assert m, out[-2000:]
            got[int(m.group(1))] = (int(m.group(2)), m.group(3))
        return got

    a = grab(outs_a, "PHASEA")
    b = grab(outs_b, "PHASEB")
    for pid in (0, 1):
        assert b[pid][0] == 2, f"iteration not resumed: {b[pid]}"
        # EXACT env-state round trip, per process
        assert a[pid][1] == b[pid][1], f"pid {pid}: {a[pid][1]} != {b[pid][1]}"
    for out in outs_b:
        assert "RESUMED_OK" in out
