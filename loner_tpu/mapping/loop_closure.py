"""Loop closure + pose-graph refinement over keyframes.

Ties the distributed pose-graph solver (``loner_tpu/parallel/pose_graph.py``)
into the SLAM loop — the capability the reference lacks (its keyframe poses
are only corrected through the rendering loss) and the project north star's
"distributed BA over keyframes":

  1. candidate pairs: keyframes far apart in time but near in space
  2. factor generation: point-to-plane ICP re-alignment of the two scans
     (the same jitted GN ICP the tracker uses), accepted by fitness/rmse
  3. graph: odometry between-factors from tracked poses + loop factors +
     weak priors on the mapper-optimized poses, anchored at keyframe 0
  4. solve: Gauss-Newton with factors sharded over the mesh (psum-reduced
     normal system), then feed corrected poses back to the mapper state and
     trajectory logger.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from loner_tpu.geometry import se3
from loner_tpu.parallel.pose_graph import (
    PoseGraphFactors,
    PosePriors,
    make_factors,
    make_priors,
    solve_pose_graph,
)
from loner_tpu.tracking.icp import IcpConfig, IcpStage, make_icp


@dataclass
class LoopClosureConfig:
    enabled: bool = False
    min_index_gap: int = 8  # candidate pairs must be this many KFs apart
    max_candidate_distance_m: float = 4.0
    max_candidates: int = 16  # ICP budget per finish() call
    # suppress candidate pairs within this index radius of an already-chosen
    # pair (spread the ICP budget along the loop). Radius 1 keeps enough
    # revisit pairs to tie INTRA-lap drift down — with a sparser graph the
    # drift between tie points is unobservable and BA can only repair the
    # endpoint (measured on the yaw-drift e2e case, r5)
    suppression_radius: int = 1
    # accept gates: fitness ~0.5 is normal for partial-overlap spinning-lidar
    # scans (sky misses), so the rmse gate carries most of the rejection work
    min_fitness: float = 0.35
    max_rmse: float = 0.3
    icp: IcpConfig = field(
        default_factory=lambda: IcpConfig(
            stages=(IcpStage(1.5, 10), IcpStage(0.25, 10)), n_buckets=1 << 13
        )
    )
    target_points: int = 2048
    odometry_weight: float = 1.0
    loop_weight: float = 2.0
    prior_weight: float = 0.01  # weak pull toward mapper-optimized poses
    gn_iterations: int = 10


def _kf_cloud(kf, target_points: int) -> Tuple[np.ndarray, np.ndarray]:
    """Sensor-frame points of a keyframe's scan, uniformly downsampled to a
    fixed budget (static ICP shapes)."""
    dirs = np.asarray(kf.scan.ray_directions)
    dist = np.asarray(kf.scan.distances)
    valid = np.asarray(kf.scan.valid)
    idx = np.flatnonzero(valid)
    n = target_points
    if len(idx) > n:
        idx = idx[np.linspace(0, len(idx) - 1, n).astype(np.int64)]
    pts = dirs[idx] * dist[idx, None]
    pad = n - len(idx)
    v = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
    if pad:
        pts = np.concatenate([pts, np.zeros((pad, 3), pts.dtype)])
    return pts.astype(np.float32), v


def find_candidates(
    positions: np.ndarray,  # (K, 3) current keyframe positions
    cfg: LoopClosureConfig,
) -> List[Tuple[int, int]]:
    """Keyframe pairs far in index, near in space; closest-first."""
    k = len(positions)
    cands = []
    for i in range(k):
        for j in range(i + cfg.min_index_gap, k):
            d = float(np.linalg.norm(positions[i] - positions[j]))
            if d <= cfg.max_candidate_distance_m:
                cands.append((d, i, j))
    cands.sort()
    out = []
    for d, i, j in cands:
        # suppress near-duplicates of already-chosen pairs so the ICP budget
        # spreads over the loop instead of burning on one corner
        r = cfg.suppression_radius
        if any(abs(i - a) <= r and abs(j - b) <= r for a, b in out):
            continue
        out.append((i, j))
        if len(out) >= cfg.max_candidates:
            break
    return out


def generate_loop_factors(
    keyframes: Sequence,
    poses: np.ndarray,  # (K, 4, 4) current optimized keyframe poses
    cfg: LoopClosureConfig,
) -> List[tuple]:
    """ICP-verified loop-closure edges (i, j, T_i^-1 T_j, weight)."""
    icp = make_icp(cfg.icp)
    positions = poses[:, :3, 3]
    edges = []
    for i, j in find_candidates(positions, cfg):
        pts_i, v_i = _kf_cloud(keyframes[i], cfg.target_points)
        pts_j, v_j = _kf_cloud(keyframes[j], cfg.target_points)
        # initial guess from current poses: T_ij maps j's sensor frame into i's
        T_init = np.linalg.inv(poses[i]) @ poses[j]
        T_rel, rmse, fitness = icp(
            jnp.asarray(pts_j),
            jnp.asarray(v_j),
            jnp.asarray(pts_i),
            jnp.asarray(v_i),
            jnp.asarray(T_init, jnp.float32),
        )
        rmse, fitness = float(rmse), float(fitness)
        if fitness >= cfg.min_fitness and rmse <= cfg.max_rmse:
            # information-scaled: a tight ICP fit (low rmse) is worth far
            # more than a marginal one, and must out-pull the accumulated
            # odometry chain it contradicts
            w = cfg.loop_weight * fitness / max(rmse, 0.01)
            edges.append((i, j, np.asarray(T_rel, np.float64), w))
    return edges


def refine_keyframe_poses(
    keyframes: Sequence,
    optimized_poses: np.ndarray,  # (K, 4, 4) mapper-optimized poses
    cfg: LoopClosureConfig,
    mesh=None,
) -> Tuple[np.ndarray, dict]:
    """Full pipeline: odometry factors from tracked poses + ICP loop factors
    + weak priors on the mapper's poses -> Gauss-Newton solve. Returns
    (refined (K, 4, 4), info dict)."""
    k = len(keyframes)
    tracked = np.stack([kf.tracked_pose for kf in keyframes])

    edges = []
    for i in range(k - 1):
        z = np.linalg.inv(tracked[i]) @ tracked[i + 1]
        edges.append((i, i + 1, z, cfg.odometry_weight))
    loops = generate_loop_factors(keyframes, optimized_poses, cfg)
    edges.extend(loops)

    priors = make_priors(
        [(i, optimized_poses[i], cfg.prior_weight) for i in range(k)]
    )
    factors = make_factors(edges)
    pose6 = jnp.stack(
        [se3.matrix_to_pose(jnp.asarray(T, jnp.float32)) for T in optimized_poses]
    )
    refined6, cost = solve_pose_graph(
        pose6,
        factors,
        n_iters=cfg.gn_iterations,
        mesh=mesh,
        priors=priors,
    )
    refined = np.stack(
        [np.asarray(se3.pose_to_matrix(p), np.float64) for p in refined6]
    )
    return refined, {
        "n_loop_closures": len(loops),
        "n_factors": len(edges),
        "final_cost": float(cost),
    }
