"""Meshing: splat rendered sample weights into a grid, extract an isosurface.

Covers ``analysis/mesher.py`` + ``analysis/meshing.py`` (NICE-SLAM-style:
virtual lidar scans from every skip_step-th keyframe pose, per-sample weight
splatting into a uniform grid via bucketize+max, isosurface at a level,
rescale out of the world cube). The isosurface extractor is a naive
surface-nets dual contour (one vertex per sign-change cell, two triangles
per crossing face) — chosen over classic marching cubes because this
environment ships no skimage and surface nets is compact, watertight-enough
for the cloud/chamfer evaluation protocol the metrics use.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.data import synthetic
from loner_tpu.geometry.rays import build_lidar_rays
from loner_tpu.mapping.optimizer import MapperConfig, make_render_fn


def splat_weights_to_grid(
    points_cube: np.ndarray,  # (N, 3) sample points in [-1,1]
    weights: np.ndarray,  # (N,)
    resolution: int,
    bounds: Tuple[np.ndarray, np.ndarray] = None,  # (lo, hi) in cube coords
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Max-splat weights into a (R,R,R) grid (ordered [x,y,z] here).
    Returns (grid, lo, voxel_size)."""
    if bounds is None:
        lo = np.array([-1.0, -1.0, -1.0])
        hi = np.array([1.0, 1.0, 1.0])
    else:
        lo, hi = np.asarray(bounds[0], float), np.asarray(bounds[1], float)
    voxel = (hi - lo) / resolution
    idx = np.floor((points_cube - lo) / voxel).astype(np.int64)
    inb = np.all((idx >= 0) & (idx < resolution), axis=1)
    idx = idx[inb]
    w = weights[inb]
    grid = np.zeros((resolution, resolution, resolution), np.float32)
    flat = idx[:, 0] * resolution * resolution + idx[:, 1] * resolution + idx[:, 2]
    np.maximum.at(grid.reshape(-1), flat, w)
    return grid, lo, voxel


def surface_nets(
    grid: np.ndarray,  # (R,R,R) scalar field
    level: float,
    origin: np.ndarray,
    voxel: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Naive surface nets: a vertex at the centroid of each cell whose 8
    corners straddle ``level``; quads (two triangles) across every grid edge
    with a sign change. Returns (vertices (V,3), faces (F,3) int)."""
    occ = grid > level  # (R,R,R) bool at grid vertices
    r = np.array(grid.shape)

    # cells: (R-1)^3; corner occupancy
    c = occ
    cell = np.zeros(tuple(r - 1), np.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cell += c[dx : r[0] - 1 + dx, dy : r[1] - 1 + dy, dz : r[2] - 1 + dz]
    active = (cell > 0) & (cell < 8)
    cell_ids = np.full(tuple(r - 1), -1, np.int64)
    act_idx = np.argwhere(active)
    cell_ids[tuple(act_idx.T)] = np.arange(len(act_idx))

    # vertex per active cell: cell center (could be refined to the mass
    # center of edge crossings; center is adequate at metric resolutions)
    verts = origin + (act_idx + 0.5) * voxel

    faces = []
    # for each axis, edges between vertex (i,j,k) and its +1 neighbor along
    # that axis; a sign change on the edge connects the 4 cells sharing it
    for axis in range(3):
        sl_a = tuple(slice(0, -1) if a == axis else slice(None) for a in range(3))
        sl_b = tuple(slice(1, None) if a == axis else slice(None) for a in range(3))
        cross = occ[sl_a] != occ[sl_b]
        # the edge at vertex (i,j,k) along `axis` is shared by cells
        # (i,j,k) + offsets in the two other axes in {-1,0}
        a1, a2 = [a for a in range(3) if a != axis]
        ii = np.argwhere(cross)
        # gather the 4 cell ids around each crossing edge
        quads = []
        for d1 in (-1, 0):
            for d2 in (-1, 0):
                coord = ii.copy()
                coord[:, a1] += d1
                coord[:, a2] += d2
                ok = np.all((coord >= 0) & (coord < (r - 1)), axis=1)
                ids = np.full(len(ii), -1, np.int64)
                ids[ok] = cell_ids[tuple(coord[ok].T)]
                quads.append(ids)
        q = np.stack(quads, axis=1)  # (E, 4) order: (-1,-1), (-1,0), (0,-1), (0,0)
        good = np.all(q >= 0, axis=1)
        q = q[good]
        # two triangles per quad: (a, b, d), (a, d, c) with corner order
        faces.append(np.stack([q[:, 0], q[:, 1], q[:, 3]], axis=1))
        faces.append(np.stack([q[:, 0], q[:, 3], q[:, 2]], axis=1))

    faces = np.concatenate(faces, axis=0) if faces else np.zeros((0, 3), np.int64)
    return verts, faces


class Mesher:
    """Render -> splat -> isosurface, out of the cube into metric space."""

    def __init__(self, cfg: MapperConfig, cube, state):
        self.cfg = cfg
        self.cube = cube
        self.state = state

    def get_mesh(
        self,
        keyframe_poses: np.ndarray,  # (N,4,4) metric poses to scan from
        resolution: int = 128,
        level: float = 0.1,
        skip_step: int = 1,
        n_channels: int = 32,
        n_azimuth: int = 256,
        chunk: int = 16384,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (vertices (V,3) metric, faces (F,3))."""
        render_fn = make_render_fn(self.cfg, test=False)
        key = jax.random.PRNGKey(0)

        all_pts = []
        all_w = []
        dirs = synthetic.spinning_lidar_directions(n_channels, n_azimuth)
        for pose in keyframe_poses[::skip_step]:
            pose_j = jnp.asarray(pose, jnp.float32)
            for s in range(0, dirs.shape[0], chunk):
                d = dirs[s : s + chunk]
                pad = chunk - d.shape[0]
                if pad:
                    d = np.concatenate([d, np.tile(d[-1:], (pad, 1))])
                bundle = build_lidar_rays(
                    jnp.asarray(d, jnp.float32), jnp.zeros(d.shape[0]), pose_j, self.cube, self.cfg.ray_range
                )
                key, sub = jax.random.split(key)
                r = render_fn(self.state.params, self.state.occ_grid, bundle, sub)
                n_real = chunk - pad
                # RenderResult.points is transposed (3, N, S)
                all_pts.append(
                    np.moveaxis(np.asarray(r.points), 0, -1)[:n_real].reshape(-1, 3)
                )
                all_w.append(np.asarray(r.weights)[:n_real].reshape(-1))

        pts = np.concatenate(all_pts)
        w = np.concatenate(all_w)
        grid, lo, voxel = splat_weights_to_grid(pts, w, resolution)
        verts, faces = surface_nets(grid, level, lo, voxel)
        # rescale out of the world cube (mesher.py:216-221)
        scale = float(self.cfg.world_scale)
        shift = np.asarray(self.cube.shift)
        return verts * scale - shift, faces


def save_ply(path: str, vertices: np.ndarray, faces: np.ndarray):
    """Minimal ascii PLY writer (open3d's io role for meshes)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in vertices:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def save_pcd(path: str, points: np.ndarray):
    """Minimal ascii PCD writer (``ray_utils.py:326-407`` pcd writers role)."""
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\nVERSION 0.7\n")
        f.write("FIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n")
        f.write(f"WIDTH {len(points)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {len(points)}\nDATA ascii\n")
        for p in points:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
