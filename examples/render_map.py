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
    ap.add_argument("mode", choices=["lidar", "mesh", "depth", "video"])
    ap.add_argument("--run", required=True, help="run directory with full_config.pkl + checkpoints/")
    ap.add_argument("--poses", required=False, default=None, help="TUM trajectory to render along")
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
    ap.add_argument(
        "--peak-consistency", action="store_true",
        help="also write |argmax-weight depth - expected depth| maps "
        "(reference analysis/renderer.py:181-216)",
    )
    ap.add_argument(
        "--only-last-frame", action="store_true",
        help="render only the trajectory's final pose",
    )
    ap.add_argument(
        "--render-pose", default=None,
        help="render one arbitrary pose 'x,y,z,yaw,pitch,roll' (meters/deg) "
        "instead of the trajectory (reference --render_pose)",
    )
    # video mode (reference analysis/renderer.py:330-420)
    ap.add_argument("--velocity", type=float, default=1.0, help="fly-through m/s")
    ap.add_argument("--fps", type=float, default=5.0)
    ap.add_argument("--spin-spacing-m", type=float, default=10.0, help="360-spin every this many meters (0 = never)")
    ap.add_argument("--spin-duration-s", type=float, default=15.0)
    ap.add_argument("--no-interp", action="store_true", help="render the raw trajectory poses")
    ap.add_argument("--max-depth", type=float, default=50.0, help="depth colormap range")
    args = ap.parse_args()

    from loner_tpu.analysis.mesher import Mesher, save_pcd, save_ply
    from loner_tpu.analysis.renderer import assemble_global_cloud, render_camera_image
    from loner_tpu.runtime.trajectory_logger import load_tum

    cfg, cube, state = load_run(args.run)
    if args.render_pose is not None:
        from scipy.spatial.transform import Rotation

        vals = [float(v) for v in args.render_pose.split(",")]
        T = np.eye(4)
        T[:3, :3] = Rotation.from_euler("ZYX", vals[3:], degrees=True).as_matrix()
        T[:3, 3] = vals[:3]
        poses, ts = np.asarray([T]), np.asarray([0.0])
    else:
        if args.poses is None:
            ap.error("--poses is required unless --render-pose is given")
        poses, ts = load_tum(args.poses)
        if args.only_last_frame:
            poses, ts = poses[-1:], ts[-1:]

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
    elif args.mode == "depth":
        from loner_tpu.analysis.render_utils import save_depth_png, save_rgb_png

        os.makedirs(args.out, exist_ok=True)
        K = np.array(
            [[args.width / 2, 0, args.width / 2], [0, args.width / 2, args.height / 2], [0, 0, 1.0]]
        )
        for i, pose in enumerate(poses[:: args.skip_step]):
            img = render_camera_image(
                cfg, cube, state, pose, K, args.height, args.width,
                rgb=args.rgb, render_strategy=args.render_strategy,
                peak_consistency=args.peak_consistency,
            )
            save_depth_png(
                img["depth"], os.path.join(args.out, f"depth_{i:04d}.png"),
                max_depth=args.max_depth,
            )
            if args.rgb:
                save_rgb_png(img["rgb"], os.path.join(args.out, f"rgb_{i:04d}.png"))
            if args.peak_consistency:
                save_depth_png(
                    img["peak_depth"],
                    os.path.join(args.out, f"peak_depth_{i:04d}.png"),
                    min_depth=0.0, max_depth=5.0,
                )
        print(f"[render_map] depth images -> {args.out}")
    else:  # video: interpolated fly-through with periodic 360 spins
        from loner_tpu.analysis.render_utils import (
            depth_colormap,
            interpolate_camera_path,
            write_video,
        )

        K = np.array(
            [[args.width / 2, 0, args.width / 2], [0, args.width / 2, args.height / 2], [0, 0, 1.0]]
        )
        path_poses, spin_idxs = interpolate_camera_path(
            poses,
            velocity=args.velocity,
            fps=args.fps,
            spin_spacing_m=args.spin_spacing_m or None,
            spin_duration_s=args.spin_duration_s,
            no_interp=args.no_interp,
        )
        frames = []
        for i, pose in enumerate(path_poses):
            img = render_camera_image(
                cfg, cube, state, pose, K, args.height, args.width, rgb=args.rgb,
                render_strategy=args.render_strategy,
            )
            depth_rgb = depth_colormap(img["depth"], max_depth=args.max_depth)[..., :3]
            if args.rgb:
                g = (np.clip(img["rgb"], 0, 1) * 255).astype(np.uint8)
                if g.shape[-1] == 1:
                    g = np.repeat(g, 3, axis=-1)
                frames.append(np.concatenate([depth_rgb, g], axis=1))
            else:
                frames.append(depth_rgb)
            if (i + 1) % 20 == 0:
                print(f"[render_map] frame {i + 1}/{len(path_poses)}")
        write_video(frames, args.out, fps=args.fps)
        print(
            f"[render_map] {len(frames)} frames ({len(spin_idxs)} spins) -> {args.out}"
        )


if __name__ == "__main__":
    main()
