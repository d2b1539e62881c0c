"""FLOPs / bytes / issue-census accounting for one train iteration.

Library form of the roofline census (round-4 VERDICT item; round 5 moved
it into the package so `bench.py` computes its MFU field from the SAME
census at bench time instead of a pasted constant — kernel or network
changes can no longer silently stale the driver-recorded MFU).

The physics kernel is VPU work (batched tiny-matrix algebra, env-on-
lanes), so it can never approach the MXU peak by construction; the
honest utilization statement has three axes:
  - MFU        = total FLOPs / (iter_time * MXU bf16 peak)   [standard]
  - VPU util   = VPU FLOPs / (iter_time * VPU f32 peak)
  - HBM util   = bytes moved / (iter_time * HBM bandwidth)

Peaks (TPU v5e, public spec): 197 TFLOP/s bf16 MXU, ~3.9 TFLOP/s f32
VPU (8 sublanes x 128 lanes x 4 ALUs x ~0.94 GHz, FMA = 2 FLOP), HBM
819 GB/s.
"""

from __future__ import annotations

import math
from functools import partial

# primitives counted as arithmetic (1 FLOP per output element; FMA-style
# fusion is the compiler's business — this is the *algorithmic* count)
_ARITH = {
    "add", "sub", "mul", "div", "neg", "max", "min", "exp", "log", "sqrt",
    "rsqrt", "sin", "cos", "tanh", "abs", "sign", "floor", "integer_pow",
    "select_n", "clamp", "logistic",
}

MXU_BF16_PEAK = 197e12
VPU_F32_PEAK = 3.9e12
HBM_BW = 819e9


def _flops_of(jaxpr, loop_trips):
    """Walk a jaxpr; arithmetic FLOPs with while-loop bodies multiplied by
    the trip counts in `loop_trips` (outermost first)."""
    total = 0

    def walk(jx, depth):
        nonlocal total
        for eq in jx.eqns:
            subs = []
            for p in eq.params.values():
                if hasattr(p, "jaxpr"):
                    subs.append(p.jaxpr if hasattr(p.jaxpr, "eqns") else p)
                elif hasattr(p, "eqns"):
                    subs.append(p)
            if eq.primitive.name == "while":
                trip = loop_trips[depth] if depth < len(loop_trips) else 1
                before = total
                for s in subs:
                    walk(s if hasattr(s, "eqns") else s.jaxpr, depth + 1)
                total = before + (total - before) * trip
            elif subs:
                for s in subs:
                    walk(s if hasattr(s, "eqns") else s.jaxpr, depth)
            elif eq.primitive.name in _ARITH:
                for ov in eq.outvars:
                    total += int(math.prod(ov.aval.shape) or 1)
    walk(jaxpr, 0)
    return total


def _kernel_jaxpr(decimation, iterations):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..physics import mega_kernel as mk
    from ..physics.model import build_xbot_model

    m = build_xbot_model()
    KP = jnp.asarray(
        [200, 200, 350, 350, 15, 15, 200, 200, 350, 350, 15, 15], jnp.float32
    )
    sm = mk._StaticModel(m, KP, jnp.full(12, 10.0), np.asarray(m.dof_effort) * 0.85)
    packed = jnp.zeros((mk.TILE_ENVS, mk.IN_ROWS))
    f = partial(
        mk._mega_call, sm=sm, dt=0.001, decimation=decimation,
        iterations=iterations, contact_offset=0.01, max_depen_vel=1.0,
        interpret=True, terrain=None,
    )
    return jax.make_jaxpr(lambda p: f(p, None))(packed), mk.TILE_ENVS


def physics_flops_per_step(envs, terrain=False, decimation=10, iterations=8):
    """FLOPs of ONE policy step of physics (kernel jaxpr, all substeps)."""
    jaxpr, tile_envs = _kernel_jaxpr(decimation, iterations)
    # one tile of 128 envs; outer while = decimation, inner = APGD iters
    per_tile = _flops_of(jaxpr.jaxpr, (decimation, iterations))
    return per_tile * (envs / tile_envs)


def physics_vregs_per_step(envs, decimation=10, iterations=8):
    """Vector-register ops of ONE policy step: every kernel eqn weighted by
    its output (8,128)-tile count, loop trips applied. This — not FLOPs —
    is what the issue-bound kernel's runtime tracks: a lane-scalar (128,)
    value occupies a full vreg issue slot at 1/8 useful elements."""
    jaxpr, tile_envs = _kernel_jaxpr(decimation, iterations)
    total = 0

    def vregs(shape):
        if not shape:
            return 1
        lanes = shape[-1]
        subl = shape[-2] if len(shape) >= 2 else 1
        outer = math.prod(shape[:-2]) if len(shape) > 2 else 1
        return outer * math.ceil(subl / 8) * math.ceil(lanes / 128)

    def walk(jx, depth):
        nonlocal total
        trips = (decimation, iterations)
        for eq in jx.eqns:
            subs = []
            for p in eq.params.values():
                if hasattr(p, "jaxpr"):
                    subs.append(p.jaxpr if hasattr(p.jaxpr, "eqns") else p)
                elif hasattr(p, "eqns"):
                    subs.append(p)
            if eq.primitive.name == "while":
                trip = trips[depth] if depth < len(trips) else 1
                before = total
                for s in subs:
                    walk(s if hasattr(s, "eqns") else s.jaxpr, depth + 1)
                total = before + (total - before) * trip
            elif subs:
                for s in subs:
                    walk(s if hasattr(s, "eqns") else s.jaxpr, depth)
            else:
                for ov in eq.outvars:
                    total += vregs(getattr(ov.aval, "shape", ()))
    walk(jaxpr.jaxpr, 0)
    return total * (envs / tile_envs)


def net_flops(envs, T=60, epochs=2,
              obs=705, priv=219, act=12,
              actor_hidden=(512, 256, 128), critic_hidden=(768, 256, 128)):
    """Actor/critic matmul FLOPs (logical, unpadded): rollout fwd + learn
    fwd+bwd (bwd = 2x fwd). Defaults are the flat XBot-L nets."""
    def mlp(dims):
        return sum(a * b for a, b in zip(dims[:-1], dims[1:]))

    actor = mlp((obs, *actor_hidden, act))
    critic = mlp((priv, *critic_hidden, 1))
    per_sample_fwd = 2 * (actor + critic)  # MAC = 2 FLOP
    batch = envs * T
    rollout = batch * per_sample_fwd
    learn = batch * epochs * per_sample_fwd * 3  # fwd + bwd(2x)
    return rollout, learn


def hbm_bytes(envs, T=60, terrain=False):
    """Major per-iteration HBM flows (bytes), both directions counted."""
    batch = envs * T
    vec = 705 + 219 + 12 * 3  # rollout vector row
    flows = {
        "rollout storage write": batch * (vec + 4) * 4,
        "perm gathers (read+write)": 2 * batch * (vec + 4) * 4,
        "learn minibatch reads (2 epochs)": 2 * batch * (vec + 4) * 4,
        "kernel in/out tiles (60 launches)": (
            T * (envs / 128) * (120 + 304 + 136) * 128 * 4
        ),
    }
    if terrain:
        # two (48,128) f32 window gathers per step (patches + probe)
        flows["terrain window gathers"] = 2 * T * envs * 48 * 128 * 4 * 2
    return flows


def iteration_flops(envs, T=60, epochs=2):
    """Total FLOPs of one flat-task train iteration (physics + nets + GAE).
    This is THE number bench.py divides by the MXU peak for its `mfu`
    field — computed from the live kernel jaxpr, never a constant."""
    phys = physics_flops_per_step(envs) * T
    roll_nn, learn_nn = net_flops(envs, T, epochs)
    gae = envs * T * 10  # reverse scan + normalization, ~10 FLOP/sample
    return phys + roll_nn + learn_nn + gae
