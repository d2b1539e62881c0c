"""Measured (not fitted) per-stage decomposition of the train iteration.

Round-5 VERDICT item #2: the round-4 roofline ATTRIBUTED ~66 ms/iter to
learn-stage net matmuls by subtraction, but moving them to bf16 gained
only 12 ms — so the attribution needed a measurement.

Measurement method: the axon tunnel has a ~25 ms per-call dispatch+fetch
floor (measured: every sub-30 ms stage "times" at ~26 ms as a standalone
call), so each stage is timed as K=16 CHAINED repetitions inside one
jitted lax.scan with a loop-carried data dependency (so XLA cannot hoist
or CSE the repeated work), and the per-rep cost is (T_K - T_1)/(K - 1) —
the subtraction cancels both the call floor and any constant program
overhead. `full` and `rollout` carry their real state; cheap stages
thread a `x + 0.0*carry` dependency (float 0*x is not folded by XLA).

Stages:
  full        the complete train_iter (the bench program)
  rollout     rollout_phase alone (scan of env step + policy)
  gae         critic bootstrap + GAE scans + normalization
  permute     the two epoch gathers (big vec + stacked scalars)
  update1     ONE minibatch_update (loss fwd+bwd + Adam); x8 = learn
  fwd         actor+critic forward on one minibatch (no grad)
  fwdbwd      loss grad on one minibatch (no Adam/clip)
  adam        grad-norm clip + Adam step alone

Usage (real chip):  python scripts/learn_profile.py [--envs 4096]
                    [--reps 3] [--chain 16] [--dtype auto|float32|bfloat16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()


def time_chained(step_fn, carry0, data, fetch, chain, reps, name=""):
    """Per-rep seconds of step_fn(carry, data) via (T_chain - T_1)/(chain-1).

    `data` (a pytree of device arrays) is passed as a jit ARGUMENT — a
    closure over a ~1 GB rollout tensor would bake it into the HLO as a
    constant, and shipping that through the axon remote-compile tunnel
    both dominates compile time and breaks the pipe."""
    import jax

    def make(k):
        def body_scan(c, d):
            return jax.lax.scan(
                lambda cc, _: (step_fn(cc, d), None), c, None, length=k
            )[0]

        return jax.jit(body_scan)

    f1, fk = make(1), make(chain)

    def run(f):
        out = f(carry0, data)
        fetch(out)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = f(carry0, data)
            fetch(out)
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    t1 = run(f1)
    tk = run(fk)
    per = max(tk - t1, 0.0) / (chain - 1)
    # incremental print so a tunnel death mid-run loses nothing
    print(f"# stage {name}: per_rep {per*1e3:.2f} ms (single-call "
          f"{t1*1e3:.1f} ms)", flush=True)
    return per, t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--dtype", type=str, default="auto")
    ap.add_argument("--stages", type=str, default="",
                    help="comma list to run (default all); e.g. "
                         "'gae,permute,update1,fwd,fwdbwd,adam' skips the "
                         "two expensive whole-iteration compiles")
    a = ap.parse_args()
    want = set(s for s in a.stages.split(",") if s)
    sel = lambda name: (not want) or (name in want)

    import jax
    import jax.numpy as jnp

    from humanoid_gym_tpu.algo import ppo as PPO
    from humanoid_gym_tpu.algo.networks import ActorCritic
    from humanoid_gym_tpu.algo.ppo import (
        PPOConfig, init_train_state, make_train_pieces,
    )
    from humanoid_gym_tpu.config.xbotl import XBotLCfg, XBotLCfgPPO
    from humanoid_gym_tpu.envs import make_env

    N = a.envs
    cfg = XBotLCfg()
    cfg.env.num_envs = N
    # production solver per backend, same rule as bench.py
    cfg.sim.solver.solver_type = (
        "apgd" if jax.default_backend() == "cpu" else "mega"
    )
    tcfg = XBotLCfgPPO()
    env = make_env(cfg)
    net = ActorCritic(
        num_actions=cfg.env.num_actions,
        actor_hidden=tuple(tcfg.policy.actor_hidden_dims),
        critic_hidden=tuple(tcfg.policy.critic_hidden_dims),
        compute_dtype=a.dtype,
    )
    algo_cfg = PPOConfig.from_cfg(tcfg.algorithm)
    algo_cfg.num_steps_per_env = tcfg.runner.num_steps_per_env
    T = algo_cfg.num_steps_per_env
    batch = N * T
    mb_size = batch // algo_cfg.num_mini_batches

    key = jax.random.PRNGKey(0)
    k_init, k_env, key = jax.random.split(key, 3)
    ts = init_train_state(
        k_init, net, cfg.env.num_observations, cfg.env.num_privileged_obs,
        algo_cfg.learning_rate,
    )
    keys = jax.random.split(k_env, N)
    state = jax.jit(env.init_state)(keys, jnp.arange(N))
    obs = jnp.zeros((N, cfg.env.num_observations))
    priv = jnp.zeros((N, cfg.env.num_privileged_obs))

    O = cfg.env.num_observations
    P = cfg.env.num_privileged_obs
    A = cfg.env.num_actions
    fs = lambda x: float(np.asarray(x))

    pieces = make_train_pieces(env, net, algo_cfg, N)
    results, singles = {}, {}

    # --- full (real carried state) ---
    def full_step(c, d):
        ts_, st_, ob_, pv_, k_ = c
        ts_, st_, ob_, pv_, k_, _m = pieces["train_iter"](ts_, st_, ob_, pv_, k_)
        return (ts_, st_, ob_, pv_, k_)

    if sel("full"):
        results["full"], singles["full"] = time_chained(
            full_step, (ts, state, obs, priv, key), None,
            lambda c: fs(c[4][0]), a.chain, a.reps, "full",
        )

    # --- rollout (real carried state) ---
    def roll_step(c, d):
        ts_, st_, ob_, pv_, k_ = c
        st_, ob_, pv_, _roll, _i = pieces["rollout_phase"](ts_, st_, ob_, pv_, k_)
        k_ = jax.random.fold_in(k_, 1)
        return (ts_, st_, ob_, pv_, k_)

    if sel("rollout"):
        results["rollout"], singles["rollout"] = time_chained(
            roll_step, (ts, state, obs, priv, key), None,
            lambda c: fs(c[4][0]), a.chain, a.reps, "rollout",
        )

    # materialize one rollout for the downstream stages
    st_, ob_, pv_, roll, _ = jax.jit(pieces["rollout_phase"])(
        ts, state, obs, priv, key
    )
    roll = jax.block_until_ready(roll)
    pv_ = jax.block_until_ready(pv_)

    # --- gae (dependency: rewards + 0*acc) ---
    def gae_step(acc, d):
        roll_d, pv_d = d
        r2 = roll_d._replace(rewards=roll_d.rewards + 0.0 * acc)
        adv, ret = pieces["compute_gae"](ts, r2, pv_d)
        return adv[0, 0] + ret[0, 0]

    if sel("gae"):
        results["gae"], singles["gae"] = time_chained(
            gae_step, jnp.asarray(0.0), (roll, pv_), fs, a.chain, a.reps,
            "gae",
        )
    adv, ret = jax.jit(pieces["compute_gae"])(ts, roll, pv_)

    flat = lambda x: x.reshape((batch,) + x.shape[2:])
    big = jax.block_until_ready(flat(roll.vec))
    small = jax.block_until_ready(
        jnp.stack(
            [flat(roll.log_probs), flat(roll.values), flat(adv), flat(ret)],
            axis=-1,
        )
    )

    # --- permute (dependency: fresh key each rep) ---
    def perm_step(c, d):
        big_d, small_d = d
        k_, acc = c
        k_, ku = jax.random.split(k_)
        perm = jax.random.permutation(ku, batch)
        b2 = big_d[perm]
        s2 = small_d[perm]
        return (k_, acc + b2[0, 0] + s2[0, 0])

    if sel("permute"):
        results["permute"], singles["permute"] = time_chained(
            perm_step, (key, jnp.asarray(0.0)), (big, small),
            lambda c: fs(c[1]), a.chain, a.reps, "permute",
        )

    vec_mb = big[:mb_size]
    sc_mb = small[:mb_size]
    mb = (
        vec_mb[:, :O],
        vec_mb[:, O:O + P],
        vec_mb[:, O + P:O + P + A],
        sc_mb[:, 0], sc_mb[:, 1], sc_mb[:, 2], sc_mb[:, 3],
        vec_mb[:, O + P + A:O + P + 2 * A],
        vec_mb[:, O + P + 2 * A:],
    )
    mb = jax.block_until_ready(mb)

    # --- one minibatch update (real ts dependency) ---
    def upd_step(ts_, mb_d):
        ts_, _m = pieces["minibatch_update"](ts_, mb_d)
        return ts_

    if sel("update1"):
        results["update1"], singles["update1"] = time_chained(
            upd_step, ts, mb, lambda t: fs(t.lr), a.chain, a.reps,
            "update1",
        )

    # --- fwd (dependency: obs + 0*acc) ---
    def fwd_step(acc, mb_d):
        o2 = mb_d[0] + 0.0 * acc
        p2 = mb_d[1] + 0.0 * acc
        mean, std = pieces["actor_apply"](ts.params, o2)
        value = pieces["critic_apply"](ts.params, p2)
        return jnp.sum(mean) + jnp.sum(value) + jnp.sum(std)

    if sel("fwd"):
        results["fwd"], singles["fwd"] = time_chained(
            fwd_step, jnp.asarray(0.0), mb, fs, a.chain, a.reps, "fwd",
        )

    # --- fwdbwd (dependency: params + 0*grads) ---
    def fwdbwd_step(params, mb_d):
        grads, _aux = jax.grad(
            pieces["make_loss_fn"](mb_d), has_aux=True
        )(params)
        return jax.tree.map(lambda p, g: p + 0.0 * g, params, grads)

    if sel("fwdbwd"):
        results["fwdbwd"], singles["fwdbwd"] = time_chained(
            fwdbwd_step, ts.params, mb,
            lambda p: fs(jax.tree.leaves(p)[0].ravel()[0]), a.chain, a.reps,
            "fwdbwd",
        )
    grads, _ = jax.jit(
        lambda p, m: jax.grad(pieces["make_loss_fn"](m), has_aux=True)(p)
    )(ts.params, mb)
    grads = jax.block_until_ready(grads)

    # --- adam (real param/opt dependency) ---
    import optax

    def adam_step(c, grads_d):
        params, mu, nu, cnt = c
        gnorm = optax.global_norm(grads_d)
        scale = jnp.minimum(1.0, algo_cfg.max_grad_norm / (gnorm + 1e-12))
        g2 = jax.tree.map(lambda g: g * scale, grads_d)
        return PPO._adam_step(params, g2, mu, nu, cnt, ts.lr)

    if sel("adam"):
        results["adam"], singles["adam"] = time_chained(
            adam_step, (ts.params, ts.opt_mu, ts.opt_nu, ts.opt_count), grads,
            lambda c: fs(jax.tree.leaves(c[0])[0].ravel()[0]), a.chain, a.reps,
            "adam",
        )

    n_upd = algo_cfg.num_learning_epochs * algo_cfg.num_mini_batches
    summary = {
        "envs": N, "T": T, "dtype": a.dtype,
        "backend": jax.default_backend(), "chain": a.chain,
        "stages_ms": {k: round(v * 1e3, 2) for k, v in results.items()},
        "single_call_ms": {k: round(v * 1e3, 1) for k, v in singles.items()},
        "n_updates_x_update1_ms": round(
            results.get("update1", 0.0) * n_upd * 1e3, 1
        ),
        "n_updates": n_upd,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
