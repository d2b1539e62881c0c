"""Sim2sim robustness curve: eval-farm every checkpoint of a training run.

Watches a run directory; for each new model_N.ckpt, exports the actor and
runs the native MuJoCo eval farm, appending one JSON line per checkpoint to
<run_dir>/robustness_curve.jsonl:

    {"ckpt": N, "survived": k, "rollouts": n, "mean_distance_x": d}

This turns the round-1 finding (zero-shot transfer quality peaks mid-training)
into a continuously produced artifact; checkpoint selection for deployment
reads this file. CPU-only — safe to run alongside TPU training.

Usage:
    JAX_PLATFORMS=cpu python scripts/robustness_curve.py \
        --run_dir logs/XBot_ppo/<run> [--watch] [--rollouts 16] [--duration 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hgt_jax_cache")

from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from humanoid_gym_tpu import XBOT_MJCF  # noqa: E402


def export_ckpt(ckpt_path: str, out_dir: str):
    """Load a checkpoint's actor params and export policy.bin."""
    from flax import serialization

    from humanoid_gym_tpu.export.policy_export import export_policy

    with open(ckpt_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = {"params": payload["train_state"]["params"]["params"]}
    return export_policy(params, out_dir, torchscript=False)


def eval_ckpt(ckpt_path: str, rollouts: int, duration: float, threads=None):
    import tempfile

    from humanoid_gym_tpu.export.native_eval import run_eval_farm

    d = tempfile.mkdtemp()
    export_ckpt(ckpt_path, d)
    out = run_eval_farm(
        XBOT_MJCF,
        os.path.join(d, "policy.bin"),
        rollouts=rollouts,
        duration=duration,
        threads=threads,
    )
    return out["summary"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--rollouts", type=int, default=16)
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--watch", action="store_true")
    p.add_argument("--poll_s", type=float, default=60.0)
    args = p.parse_args()

    out_path = os.path.join(args.run_dir, "robustness_curve.jsonl")
    done = set()
    if os.path.exists(out_path):
        for line in open(out_path):
            done.add(json.loads(line)["ckpt"])

    while True:
        ckpts = sorted(
            int(f.split("_")[1].split(".")[0])
            for f in os.listdir(args.run_dir)
            if f.startswith("model_") and f.endswith(".ckpt")
        )
        new = [c for c in ckpts if c not in done and c > 0]
        for c in new:
            path = os.path.join(args.run_dir, f"model_{c}.ckpt")
            try:
                summary = eval_ckpt(path, args.rollouts, args.duration, args.threads)
            except Exception as e:  # mid-write ckpt etc.
                print(f"ckpt {c}: eval failed ({e}); retrying next poll")
                continue
            rec = {
                "ckpt": c,
                "survived": summary["survived"],
                "rollouts": summary["rollouts"],
                "mean_distance_x": summary["mean_distance_x"],
                "duration_s": summary["duration_s"],
            }
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
            done.add(c)
        if not args.watch:
            break
        time.sleep(args.poll_s)


if __name__ == "__main__":
    main()
