#!/usr/bin/env python
"""Rendering + meshing CLI from a trained map checkpoint.

Counterpart of ``analysis/renderer.py`` / ``analysis/renderer_lidar.py`` /
``analysis/meshing.py``: load a checkpointed mapper state and render depth
images, virtual lidar clouds, or extract a mesh along the keyframe
trajectory.

Usage:
    python examples/render_map.py lidar --run outputs/map --poses <traj.tum> --out cloud.pcd
    python examples/render_map.py mesh  --run outputs/map --poses <traj.tum> --out mesh.ply
    python examples/render_map.py depth --run outputs/map --poses <traj.tum> --out depth_dir/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


from loner_tpu.runtime.run_io import load_run  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["lidar", "mesh", "depth"])
    ap.add_argument("--run", required=True, help="run directory with full_config.pkl + checkpoints/")
    ap.add_argument("--poses", required=True, help="TUM trajectory to render along")
    ap.add_argument("--out", required=True)
    ap.add_argument("--skip-step", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=128, help="mesh grid resolution")
    ap.add_argument("--level", type=float, default=0.1, help="mesh iso level")
    ap.add_argument("--var-threshold", type=float, default=1e-2)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument(
        "--render-strategy", default="default", choices=["default", "adjusted"],
        help="adjusted = FDT rise-delta peak depth (foliage multi-return)",
    )
    ap.add_argument("--rgb", action="store_true", help="also write intensity images")
    args = ap.parse_args()

    from loner_tpu.analysis.mesher import Mesher, save_pcd, save_ply
    from loner_tpu.analysis.renderer import assemble_global_cloud, render_camera_image
    from loner_tpu.runtime.trajectory_logger import load_tum

    cfg, cube, state = load_run(args.run)
    poses, ts = load_tum(args.poses)

    if args.mode == "lidar":
        cloud = assemble_global_cloud(
            cfg, cube, state, poses, skip_step=args.skip_step, var_threshold=args.var_threshold
        )
        if args.out.endswith(".npy"):
            np.save(args.out, cloud)
        else:
            save_pcd(args.out, cloud)
        print(f"[render_map] {len(cloud)} points -> {args.out}")
    elif args.mode == "mesh":
        mesher = Mesher(cfg, cube, state)
        verts, faces = mesher.get_mesh(
            poses, resolution=args.resolution, level=args.level, skip_step=args.skip_step
        )
        save_ply(args.out, verts, faces)
        print(f"[render_map] mesh {len(verts)} verts / {len(faces)} faces -> {args.out}")
    else:  # depth images
        os.makedirs(args.out, exist_ok=True)
        K = np.array(
            [[args.width / 2, 0, args.width / 2], [0, args.width / 2, args.height / 2], [0, 0, 1.0]]
        )
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for i, pose in enumerate(poses[:: args.skip_step]):
            img = render_camera_image(
                cfg, cube, state, pose, K, args.height, args.width,
                rgb=args.rgb, render_strategy=args.render_strategy,
            )
            plt.imsave(
                os.path.join(args.out, f"depth_{i:04d}.png"), img["depth"], cmap="turbo"
            )
            if args.rgb:
                plt.imsave(
                    os.path.join(args.out, f"rgb_{i:04d}.png"),
                    img["rgb"][..., 0] if img["rgb"].shape[-1] == 1 else img["rgb"],
                    cmap="gray" if img["rgb"].shape[-1] == 1 else None,
                )
        print(f"[render_map] depth images -> {args.out}")


if __name__ == "__main__":
    main()
