"""PPO train iteration: rollout scan + GAE + minibatched clipped update.

Numerical contract from the reference (humanoid/algo/ppo/ppo.py:39-184,
rollout_storage.py:122-170, on_policy_runner.py:124-166):
- log-probs computed on the *pre-clip* sampled action (ppo.py:91-95 with
  env-side clipping, legged_robot.py:90-91 — SURVEY §2.4 oddity, preserved)
- timeout bootstrap: rew += gamma * V(s_t) * timeout (ppo.py:107-108)
- GAE reverse scan with (1-done) masking, batch-global advantage
  normalization (rollout_storage.py:122-136)
- 2 epochs x 4 minibatches over one shared random permutation of the
  flattened T*N batch (rollout_storage.py:146-170: indices drawn once)
- KL-adaptive learning rate x/÷1.5 in [1e-5, 1e-2] applied *before* each
  minibatch's gradient step (ppo.py:136-148)
- clipped surrogate + clipped value loss + entropy bonus, grad-norm clip,
  Adam (ppo.py:150-178)

The returned train_iter is one pure jittable function; under a sharded env
axis every jnp.mean over the batch is a global (cross-shard) reduction, which
is exactly where the reference's single-GPU semantics need collectives
(SURVEY §2.3: advantage stats + KL mean are the only cross-env couplings).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .networks import ActorCritic, normal_entropy, normal_log_prob


@dataclasses.dataclass
class PPOConfig:
    """Algorithm hyperparameters (reference humanoid_config.py:230-261)."""

    clip_param: float = 0.2
    num_learning_epochs: int = 2
    num_mini_batches: int = 4
    value_loss_coef: float = 1.0
    entropy_coef: float = 0.001
    learning_rate: float = 1e-5
    max_grad_norm: float = 1.0
    use_clipped_value_loss: bool = True
    schedule: str = "adaptive"
    desired_kl: float = 0.01
    gamma: float = 0.994
    lam: float = 0.9
    num_steps_per_env: int = 60
    # DWL-style estimator head: supervised on a slice of the privileged obs
    # (e.g. base lin vel at [199:202] of the stacked XBot critic obs)
    estimator_coef: float = 0.0
    estimator_slice: tuple = (199, 202)

    @staticmethod
    def from_cfg(a) -> "PPOConfig":
        return PPOConfig(
            clip_param=a.clip_param,
            num_learning_epochs=a.num_learning_epochs,
            num_mini_batches=a.num_mini_batches,
            value_loss_coef=a.value_loss_coef,
            entropy_coef=a.entropy_coef,
            learning_rate=a.learning_rate,
            max_grad_norm=a.max_grad_norm,
            use_clipped_value_loss=a.use_clipped_value_loss,
            schedule=a.schedule,
            desired_kl=a.desired_kl,
            gamma=a.gamma,
            lam=a.lam,
            estimator_coef=getattr(a, "estimator_coef", 0.0),
            estimator_slice=tuple(getattr(a, "estimator_slice", (199, 202))),
        )


@struct.dataclass
class TrainState:
    params: Any
    opt_mu: Any  # Adam first moment
    opt_nu: Any  # Adam second moment
    opt_count: jnp.ndarray  # () int32
    lr: jnp.ndarray  # () adaptive learning rate
    iteration: jnp.ndarray  # () int32


class Rollout(NamedTuple):
    # Per-sample VECTOR data concatenated along the feature axis:
    # [obs (O), priv_obs (P), actions (A), mu (A), sigma (A)]. One tensor
    # instead of five because the epoch permutation is a per-ROW gather on
    # TPU (~14 ns/row regardless of width — measured round 4): permuting k
    # separate tensors costs k full gather passes, one concatenated tensor
    # costs one. The values and sample order are bit-identical to the
    # reference's per-tensor storage (rollout_storage.py:61-76).
    vec: jnp.ndarray  # (T, N, O+P+3A)
    log_probs: jnp.ndarray  # (T, N)
    values: jnp.ndarray  # (T, N)
    rewards: jnp.ndarray  # (T, N) (post-bootstrap)
    dones: jnp.ndarray  # (T, N) bool


def init_train_state(key, net: ActorCritic, num_obs, num_priv, lr0) -> TrainState:
    params = net.init(key, jnp.zeros((1, num_obs)), jnp.zeros((1, num_priv)))
    zeros = jax.tree.map(jnp.zeros_like, params)
    return TrainState(
        params=params,
        opt_mu=zeros,
        opt_nu=jax.tree.map(jnp.zeros_like, params),
        opt_count=jnp.asarray(0, jnp.int32),
        lr=jnp.asarray(lr0, jnp.float32),
        iteration=jnp.asarray(0, jnp.int32),
    )


def _adam_step(params, grads, mu, nu, count, lr, b1=0.9, b2=0.999, eps=1e-8):
    """Plain Adam with external (state-carried) learning rate — the scale is
    applied manually so the KL-adaptive lr lives in TrainState, not in
    optimizer hyperparams."""
    count = count + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * jnp.square(g), nu, grads)
    c1 = 1 - b1**count.astype(jnp.float32)
    c2 = 1 - b2**count.astype(jnp.float32)
    params = jax.tree.map(
        lambda p, m, v: p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps), params, mu, nu
    )
    return params, mu, nu, count


def gae(rewards, values, dones, last_value, gamma: float, lam: float):
    """Generalized advantage estimation, reverse scan over the horizon
    (reference rollout_storage.py:122-132). Shapes: (T, N) inputs,
    (N,) last_value -> (advantages, returns), both (T, N)."""

    def body(carry, xs):
        adv_next, value_next = carry
        rew, value, done = xs
        not_done = 1.0 - done.astype(jnp.float32)
        delta = rew + gamma * value_next * not_done - value
        adv = delta + gamma * lam * not_done * adv_next
        return (adv, value), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advantages, advantages + values


def make_train_pieces(
    env,
    net: ActorCritic,
    cfg: PPOConfig,
    num_envs: int,
) -> dict:
    """Build the train iteration and its stages. Returns a dict with
    `train_iter` (the production program, what `make_train_iter` returns)
    plus each stage as an independently-jittable function — rollout_phase,
    compute_gae, minibatch_update, make_loss_fn, actor_apply,
    critic_apply — so scripts/learn_profile.py can time every stage as
    its own program (round-5 VERDICT #2: measured, not fitted, stage
    times)."""

    T = cfg.num_steps_per_env
    batch = T * num_envs
    mb_size = batch // cfg.num_mini_batches

    actor_apply = partial(net.apply, method=ActorCritic.act)
    critic_apply = partial(net.apply, method=ActorCritic.evaluate)

    def rollout_phase(ts, env_state, obs, priv_obs, key):
        def step_fn(carry, _):
            env_state, obs, priv_obs, key = carry
            key, k_sample = jax.random.split(key)
            mean, std = actor_apply(ts.params, obs)
            value = critic_apply(ts.params, priv_obs)
            noise = jax.random.normal(k_sample, mean.shape)
            action = mean + std * noise
            logp = normal_log_prob(mean, std, action)
            new_env_state, tr = env.step(env_state, action)
            # timeout bootstrap (ppo.py:107-108)
            rew = tr.reward + cfg.gamma * value * tr.time_out
            data = Rollout(
                vec=jnp.concatenate(
                    [
                        obs,
                        priv_obs,
                        action,
                        mean,
                        jnp.broadcast_to(std, mean.shape),
                    ],
                    axis=-1,
                ),
                log_probs=logp,
                values=value,
                rewards=rew,
                dones=tr.done,
            )
            info = (
                tr.reward,
                tr.ep_term_sums,
                tr.ep_reset_count,
                tr.ep_len_at_reset,
                tr.ep_reward_at_reset,
                tr.nonfinite,
                tr.terrain_level,
            )
            return (new_env_state, tr.obs, tr.privileged_obs, key), (data, info)

        (env_state, obs, priv_obs, key), (roll, infos) = jax.lax.scan(
            step_fn, (env_state, obs, priv_obs, key), None, length=T
        )
        return env_state, obs, priv_obs, roll, infos

    def compute_gae(ts, roll: Rollout, last_priv_obs):
        last_value = critic_apply(ts.params, last_priv_obs)
        advantages, returns = gae(
            roll.rewards, roll.values, roll.dones, last_value, cfg.gamma, cfg.lam
        )
        # batch-global normalization (rollout_storage.py:135-136)
        adv_n = (advantages - jnp.mean(advantages)) / (jnp.std(advantages) + 1e-8)
        return adv_n, returns

    def make_loss_fn(mb):
        obs, priv, act, old_logp, old_v, adv, ret, old_mu, old_sigma = mb

        def loss_fn(params):
            mean, std = actor_apply(params, obs)
            value = critic_apply(params, priv)
            # KL for the adaptive LR (ppo.py:136-148): the reference
            # computes it at the SAME params the gradient step uses, so it
            # rides the loss forward as an aux output — no separate actor
            # pass per minibatch
            if cfg.schedule == "adaptive":
                kl = jnp.sum(
                    jnp.log(std / old_sigma + 1e-5)
                    + (jnp.square(old_sigma) + jnp.square(mean - old_mu))
                    / (2.0 * jnp.square(std))
                    - 0.5,
                    axis=-1,
                )
                kl_mean = jnp.mean(kl)
            else:
                kl_mean = jnp.asarray(0.0)
            logp = normal_log_prob(mean, std, act)
            # overflow guard only — the clipped-surrogate min/max bounds the
            # objective long before |delta|=20 matters
            ratio = jnp.exp(jnp.clip(logp - old_logp, -20.0, 20.0))
            surr = -adv * ratio
            surr_clipped = -adv * jnp.clip(
                ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param
            )
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))
            if cfg.use_clipped_value_loss:
                v_clipped = old_v + jnp.clip(
                    value - old_v, -cfg.clip_param, cfg.clip_param
                )
                value_loss = jnp.mean(
                    jnp.maximum(
                        jnp.square(value - ret), jnp.square(v_clipped - ret)
                    )
                )
            else:
                value_loss = jnp.mean(jnp.square(ret - value))
            entropy = normal_entropy(std, logp.shape)
            total = (
                surrogate_loss
                + cfg.value_loss_coef * value_loss
                - cfg.entropy_coef * jnp.mean(entropy)
            )
            if cfg.estimator_coef > 0.0 and net.estimator_dim > 0:
                est = net.apply(params, obs, method=ActorCritic.estimate)
                lo, hi = cfg.estimator_slice
                target = jax.lax.stop_gradient(priv[:, lo:hi])
                est_loss = jnp.mean(jnp.square(est - target))
                total = total + cfg.estimator_coef * est_loss
            else:
                est_loss = jnp.asarray(0.0)
            return total, (
                surrogate_loss, value_loss, jnp.mean(entropy), est_loss,
                kl_mean,
            )

        return loss_fn

    def minibatch_update(ts, mb) -> Tuple[TrainState, Dict]:
        grads, (surr_l, val_l, ent, est_l, kl_mean) = jax.grad(
            make_loss_fn(mb), has_aux=True
        )(ts.params)
        # KL-adaptive LR (x/1.5 in [1e-5, 1e-2]), applied to THIS
        # minibatch's Adam step — same ordering as the reference
        lr = ts.lr
        if cfg.schedule == "adaptive":
            lr = jnp.where(
                kl_mean > cfg.desired_kl * 2.0,
                jnp.maximum(1e-5, lr / 1.5),
                jnp.where(
                    (kl_mean < cfg.desired_kl / 2.0) & (kl_mean > 0.0),
                    jnp.minimum(1e-2, lr * 1.5),
                    lr,
                ),
            )
        # global grad-norm clip (ppo.py:173); a non-finite norm zeroes the
        # update (drop the poisoned minibatch instead of NaN-ing the params)
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(gnorm)
        scale = jnp.minimum(1.0, cfg.max_grad_norm / (gnorm + 1e-12))
        # NaN*0 is still NaN — select zero outright for poisoned minibatches
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g * scale, jnp.zeros_like(g)), grads
        )
        params, mu, nu, count = _adam_step(
            ts.params, grads, ts.opt_mu, ts.opt_nu, ts.opt_count, lr
        )
        ts = ts.replace(params=params, opt_mu=mu, opt_nu=nu, opt_count=count, lr=lr)
        return ts, {
            "value_loss": val_l,
            "surrogate_loss": surr_l,
            "entropy": ent,
            "kl": kl_mean,
            "grad_norm": gnorm,
            "estimator_loss": est_l,
        }

    def train_iter(ts: TrainState, env_state, obs, priv_obs, key):
        key, k_roll, k_perm = jax.random.split(key, 3)
        env_state, obs, priv_obs, roll, infos = rollout_phase(
            ts, env_state, obs, priv_obs, k_roll
        )
        adv, ret = compute_gae(ts, roll, priv_obs)

        O = obs.shape[-1]
        P = priv_obs.shape[-1]
        A = (roll.vec.shape[-1] - O - P) // 3
        flat = lambda x: x.reshape((batch,) + x.shape[2:])
        big = flat(roll.vec)  # (batch, O+P+3A)
        small = jnp.stack(
            [flat(roll.log_probs), flat(roll.values), flat(adv), flat(ret)],
            axis=-1,
        )  # (batch, 4)
        # one permutation shared by all epochs (rollout_storage.py:149),
        # applied ONCE so minibatches become contiguous slices. TPU gathers
        # pay per ROW (~14 ns), not per byte, so the 9 logical tensors are
        # permuted as exactly TWO gathers: the concatenated rollout vector
        # and the stacked per-sample scalars (29 ms -> ~7 ms at 4096x60,
        # measured round 4). Sample order and f32 values are identical.
        perm = jax.random.permutation(k_perm, batch)
        big = big[perm]
        small = small[perm]

        metrics_acc = None
        for _ in range(cfg.num_learning_epochs):
            for i in range(cfg.num_mini_batches):
                vec_mb = jax.lax.dynamic_slice_in_dim(
                    big, i * mb_size, mb_size
                )
                sc_mb = jax.lax.dynamic_slice_in_dim(
                    small, i * mb_size, mb_size
                )
                mb = (
                    vec_mb[:, :O],
                    vec_mb[:, O : O + P],
                    vec_mb[:, O + P : O + P + A],
                    sc_mb[:, 0],
                    sc_mb[:, 1],
                    sc_mb[:, 2],
                    sc_mb[:, 3],
                    vec_mb[:, O + P + A : O + P + 2 * A],
                    vec_mb[:, O + P + 2 * A :],
                )
                ts, mets = minibatch_update(ts, mb)
                if metrics_acc is None:
                    metrics_acc = {k: v for k, v in mets.items()}
                else:
                    metrics_acc = {
                        k: metrics_acc[k] + v for k, v in mets.items()
                    }
        n_updates = cfg.num_learning_epochs * cfg.num_mini_batches
        metrics = {k: v / n_updates for k, v in metrics_acc.items()}

        step_rewards, ep_sums, ep_resets, ep_lens, ep_rews, nonfin, terr_lvl = infos
        metrics.update(
            mean_step_reward=jnp.mean(step_rewards),
            ep_term_sums=jnp.sum(ep_sums, axis=(0, 1)),  # (n_terms,)
            ep_reset_count=jnp.sum(ep_resets),
            ep_len_sum=jnp.sum(ep_lens),
            ep_reward_sum=jnp.sum(ep_rews),
            nonfinite_resets=jnp.sum(nonfin),
            mean_terrain_level=jnp.mean(terr_lvl),
            lr=ts.lr,
            action_std_mean=jnp.mean(
                jnp.abs(ts.params["params"]["std"])
            ),
        )
        ts = ts.replace(iteration=ts.iteration + 1)
        return ts, env_state, obs, priv_obs, key, metrics

    return {
        "train_iter": train_iter,
        "rollout_phase": rollout_phase,
        "compute_gae": compute_gae,
        "minibatch_update": minibatch_update,
        "make_loss_fn": make_loss_fn,
        "actor_apply": actor_apply,
        "critic_apply": critic_apply,
    }


def make_train_iter(
    env,
    net: ActorCritic,
    cfg: PPOConfig,
    num_envs: int,
) -> Callable:
    """Build train_iter(ts, env_state, obs, priv_obs, key) ->
    (ts, env_state, obs, priv_obs, key, metrics)."""
    return make_train_pieces(env, net, cfg, num_envs)["train_iter"]
