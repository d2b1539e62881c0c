"""MuJoCo sim2sim validation CLI (reference humanoid/scripts/sim2sim.py).

Usage:
    python scripts/sim2sim.py --load_model <policy.npz|policy_jit.pt> \
        [--terrain] [--duration 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from humanoid_gym_tpu import XBOT_MJCF  # noqa: E402
from humanoid_gym_tpu import XBOT_TERRAIN_MJCF as XBOT_MJCF_TERRAIN  # noqa: E402


def main():
    p = argparse.ArgumentParser("sim2sim")
    p.add_argument("--load_model", type=str, required=True)
    p.add_argument("--terrain", action="store_true")
    p.add_argument("--duration", type=float, default=60.0)
    p.add_argument(
        "--video", type=str, default=None,
        help="write a software-rendered mp4 of the rollout (reference "
        "play.py:127-134 capability; headless, no GL required)",
    )
    args = p.parse_args()

    from humanoid_gym_tpu.export.policy_export import load_policy
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg, run_mujoco

    cfg = Sim2SimCfg(
        mujoco_model_path=XBOT_MJCF_TERRAIN if args.terrain else XBOT_MJCF,
        sim_duration=args.duration,
    )
    policy = load_policy(args.load_model)
    result = run_mujoco(policy, cfg, video_path=args.video)
    print(result)


if __name__ == "__main__":
    main()
