"""Interactive viewer: drive a trained policy live in the browser.

Capability analog of the reference's PhysX viewer + keyboard loop
(humanoid/envs/base/base_task.py:104-110, play.py viewer path). Headless
container, so the window is a browser tab: MJPEG stream + key events over
HTTP (humanoid_gym_tpu/export/live_viewer.py).

Usage:
  python scripts/view.py --policy <policy.npz|.pt>        # explicit file
  python scripts/view.py --run_dir logs/XBot_ppo/<run>    # latest ckpt
  python scripts/view.py --policy resources/policies/xbotl_robust_demo.npz \
      [--terrain] [--port 8800]

Then open http://127.0.0.1:8800 (forward the port if remote). Keys: arrows
vx/vy, q/e yaw, space stop, p push, r reset, v pause, ESC quit.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
from humanoid_gym_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from humanoid_gym_tpu import XBOT_MJCF as FLAT_MJCF  # noqa: E402
from humanoid_gym_tpu import XBOT_TERRAIN_MJCF as TERRAIN_MJCF  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--policy", help="policy file (.npz or TorchScript .pt)")
    g.add_argument("--run_dir", help="training run dir (latest checkpoint)")
    p.add_argument("--terrain", action="store_true",
                   help="uneven.png deployment heightfield instead of flat")
    p.add_argument("--port", type=int, default=8800)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--cmd_vx", type=float, default=0.0,
                   help="initial forward command (teleop from the browser)")
    args = p.parse_args()

    from humanoid_gym_tpu.export.live_viewer import LiveViewer
    from humanoid_gym_tpu.export.policy_export import load_policy
    from humanoid_gym_tpu.export.sim2sim import Sim2SimCfg

    if args.policy:
        policy = load_policy(args.policy)
    else:
        from scripts.robustness_curve import export_ckpt

        ckpts = sorted(
            (int(re.search(r"model_(\d+)\.ckpt", f).group(1)), f)
            for f in glob.glob(os.path.join(args.run_dir, "model_*.ckpt"))
        )
        if not ckpts:
            raise SystemExit(f"no model_*.ckpt in {args.run_dir}")
        d = "/tmp/hgt_view"
        os.makedirs(d, exist_ok=True)
        export_ckpt(ckpts[-1][1], d)
        print(f"viewing checkpoint {ckpts[-1][0]} of {args.run_dir}")
        policy = load_policy(os.path.join(d, "policy.npz"))

    cfg = Sim2SimCfg(
        mujoco_model_path=TERRAIN_MJCF if args.terrain else FLAT_MJCF,
    )
    viewer = LiveViewer(policy, cfg, fps=args.fps)
    viewer.cmd[0] = args.cmd_vx
    print(f"viewer at http://{args.host}:{args.port}  (ESC in the page quits)")
    viewer.serve(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
