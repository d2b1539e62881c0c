"""Evaluate checkpoints on the MuJoCo uneven-terrain hfield.

The flat-ground robustness curve (`scripts/robustness_curve.py`, native
farm) measures engine transfer; this measures FOOTING transfer on the
deployment terrain (XBot-L-terrain.xml / uneven.png: 1 m cells up to
0.35 m — reference sim2sim.py:170-183). Python/MuJoCo loop (the native
farm is flat-plane only), so use --stride to subsample checkpoints.

Usage:
  python scripts/eval_hfield.py --run_dir logs/.../<run> \
      [--rollouts 4] [--duration 10] [--stride 5] [--ckpt N] [--watch]

`--watch` polls the run dir while training is still writing checkpoints
(CPU MuJoCo — safe to run concurrently with a TPU training job) and
evaluates every `stride`-th checkpoint as it appears; after
`--max_idle_s` with nothing new it scores the final checkpoint and
exits. Writes hfield_curve.jsonl into the run dir.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from humanoid_gym_tpu.utils.platform import apply_platform_env

apply_platform_env()

TERRAIN_MJCF = "/root/reference/resources/robots/XBot/mjcf/XBot-L-terrain.xml"


def eval_policy(policy, rollouts: int, duration: float):
    import numpy as np

    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

    survived, dists = 0, []
    # run_mujoco is deterministic (the MJCF shim strips sensornoise), so real
    # rollout variation comes from spawning at different points of the hfield
    # (different footing) x three command speeds — walk / slow walk / STAND
    # (standing balance on rubble is its own failure mode). Seeded so curves
    # are comparable across checkpoints and runs.
    rng = np.random.default_rng(12345)
    spawns = rng.uniform(-8.0, 8.0, size=(rollouts, 2))
    for r in range(rollouts):
        cfg = Sim2SimCfg(
            mujoco_model_path=TERRAIN_MJCF, sim_duration=duration,
            cmd_vx=(0.4, 0.2, 0.0)[r % 3],
            spawn_xy=(float(spawns[r, 0]), float(spawns[r, 1])),
        )
        out = run_mujoco(policy, cfg)
        if out["fallen_at_s"] is None:
            survived += 1
        dists.append(out["distance_x"])
    return {
        "survived": survived,
        "rollouts": rollouts,
        "mean_distance_x": round(float(np.mean(dists)), 3),
        "duration_s": duration,
        # spawn-varied rollouts, cmd vx in {0.4, 0.2, 0.0}, triangulated
        # (mj_ray-exact) local-ground fall detection — the protocol of the
        # round-2 standings (reference demo 20/24). Earlier tags: spawn_v2
        # (two speeds), none (2 distinct rollouts only).
        "protocol": "spawn_v3_triangulated",
    }


def eval_ckpt(ckpt_path: str, rollouts: int, duration: float):
    from humanoid_gym_tpu.export.policy_export import load_policy
    from scripts.robustness_curve import export_ckpt

    d = os.path.join("/tmp", "hgt_hfield_eval")
    os.makedirs(d, exist_ok=True)
    export_ckpt(ckpt_path, d)
    policy = load_policy(os.path.join(d, "policy.npz"))
    return eval_policy(policy, rollouts, duration)


def main():
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--run_dir", help="evaluate a training run's checkpoints")
    g.add_argument("--policy", help="evaluate one policy file (.npz or "
                   "TorchScript .pt — e.g. the reference's shipped "
                   "policy_example.pt) instead of a run dir")
    p.add_argument("--rollouts", type=int, default=4)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--stride", type=int, default=5)
    p.add_argument("--ckpt", type=int, default=None, help="single checkpoint")
    p.add_argument("--watch", action="store_true",
                   help="poll run_dir for new checkpoints (concurrent with "
                        "training); exit after --max_idle_s of no new ckpt")
    p.add_argument("--poll_s", type=float, default=120.0)
    p.add_argument("--max_idle_s", type=float, default=1800.0)
    args = p.parse_args()

    if args.policy:
        from humanoid_gym_tpu.export.policy_export import load_policy

        res = {"policy": args.policy,
               **eval_policy(load_policy(args.policy),
                             args.rollouts, args.duration)}
        print(json.dumps(res))
        return

    out_path = os.path.join(args.run_dir, "hfield_curve.jsonl")
    seen = set()
    if os.path.exists(out_path):
        for line in open(out_path):
            seen.add(json.loads(line)["ckpt"])

    def list_ckpts():
        return sorted(
            (int(re.search(r"model_(\d+)\.ckpt", f).group(1)), f)
            for f in glob.glob(os.path.join(args.run_dir, "model_*.ckpt"))
        )

    def score(n, f, fh):
        seen.add(n)
        try:
            res = {"ckpt": n, **eval_ckpt(f, args.rollouts, args.duration)}
        except Exception as e:  # mid-write ckpt, truncated msgpack, ...
            seen.discard(n)
            print(f"ckpt {n}: eval failed ({e}); will retry", flush=True)
            return
        fh.write(json.dumps(res) + "\n")
        fh.flush()
        print(json.dumps(res), flush=True)

    if not args.watch:
        ckpts = list_ckpts()
        if args.ckpt is not None:
            ckpts = [(n, f) for n, f in ckpts if n == args.ckpt]
        else:
            ckpts = ckpts[:: args.stride] + ([ckpts[-1]] if ckpts else [])
        with open(out_path, "a") as fh:
            for n, f in ckpts:
                if n not in seen:
                    score(n, f, fh)
        return

    # watch mode: stride by checkpoint RANK in the save sequence (rank =
    # n // save_gap, stable as new checkpoints appear), so the subsample
    # matches what a post-hoc `--stride` pass would have picked.
    import time

    last_new = time.time()
    high_water = -1
    with open(out_path, "a") as fh:
        while True:
            ckpts = [(n, f) for n, f in list_ckpts() if n > 0]
            if ckpts and ckpts[-1][0] > high_water:
                high_water = ckpts[-1][0]
                last_new = time.time()  # training is alive (even off-stride)
            gap = min(
                (b - a for (a, _), (b, _) in zip(ckpts, ckpts[1:]) if b > a),
                default=None,
            )
            for n, f in ckpts:
                if n in seen or gap is None or (n // gap) % args.stride:
                    continue
                last_new = time.time()
                score(n, f, fh)
            if time.time() - last_new > args.max_idle_s:
                # training is done (or stalled): score the final checkpoint
                # even if it is off-stride, then exit.
                if ckpts and ckpts[-1][0] not in seen:
                    score(*ckpts[-1], fh)
                print("watch: idle past max_idle_s, exiting", flush=True)
                return
            time.sleep(args.poll_s)


if __name__ == "__main__":
    main()
