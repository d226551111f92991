"""Distributed pose-graph bundle adjustment over jax.lax collectives.

The reference corrects keyframe poses only through the rendering loss; this
module adds the scaling mechanism called for by the project north star:
global pose-graph refinement over keyframes — odometry between-factors (from
tracking), loop-closure factors (e.g. from submap cloud re-alignment), and an
anchor prior — solved by Gauss-Newton where the normal system is assembled
in parallel: factors are sharded across devices, each device computes its
partial H and b, and one ``psum`` reduces them before a replicated dense
solve (the Schur-trick structure: the per-factor work is the heavy part and
is embarrassingly parallel; the reduced 6K x 6K system is tiny for the MXU).

Residuals use a smooth first-order se(3) error (translation + antisymmetric
rotation part — jacfwd-safe at zero error, unlike the exact log map);
Jacobians come from jax.jacfwd (autodiff — no hand-derived adjoints to get
wrong), batched over factors with vmap.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loner_tpu.geometry import se3


class PoseGraphFactors(NamedTuple):
    """Between-factors i->j with measured relative transform z (se3 6-vec).
    Padded to a static count; ``weight`` is 0 for padding."""

    i: jnp.ndarray  # (F,) int32
    j: jnp.ndarray  # (F,) int32
    z: jnp.ndarray  # (F, 6) measured relative pose (se3 of T_i^-1 T_j)
    weight: jnp.ndarray  # (F,) factor weights (information scale)


class PosePriors(NamedTuple):
    """Unary priors: pose i should equal z (se3 6-vec) with given weight
    (e.g. anchoring keyframes to mapper-optimized poses)."""

    i: jnp.ndarray  # (P,) int32
    z: jnp.ndarray  # (P, 6)
    weight: jnp.ndarray  # (P,)


def make_priors(entries, n_pad: Optional[int] = None) -> PosePriors:
    """entries: list of (i, T (4,4), weight)."""
    ii = [e[0] for e in entries]
    zz = [np.asarray(se3.matrix_to_pose(jnp.asarray(e[1], jnp.float32))) for e in entries]
    ww = [e[2] if len(e) > 2 else 1.0 for e in entries]
    f = len(entries)
    n_pad = n_pad or f
    pad = n_pad - f
    return PosePriors(
        jnp.asarray(ii + [0] * pad, jnp.int32),
        jnp.asarray(np.concatenate([np.stack(zz), np.zeros((pad, 6))]) if pad else np.stack(zz), jnp.float32),
        jnp.asarray(ww + [0.0] * pad, jnp.float32),
    )


def make_factors(edges, n_pad: Optional[int] = None) -> PoseGraphFactors:
    """edges: list of (i, j, T_rel (4,4), weight). Pads to n_pad."""
    ii = [e[0] for e in edges]
    jj = [e[1] for e in edges]
    zz = [
        np.asarray(se3.matrix_to_pose(jnp.asarray(e[2], jnp.float32)))
        for e in edges
    ]
    ww = [e[3] if len(e) > 3 else 1.0 for e in edges]
    f = len(edges)
    n_pad = n_pad or f
    pad = n_pad - f
    return PoseGraphFactors(
        jnp.asarray(ii + [0] * pad, jnp.int32),
        jnp.asarray(jj + [0] * pad, jnp.int32),
        jnp.asarray(np.concatenate([np.stack(zz), np.zeros((pad, 6))]) if pad else np.stack(zz), jnp.float32),
        jnp.asarray(ww + [0.0] * pad, jnp.float32),
    )


def _between_residual(pi: jnp.ndarray, pj: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Smooth between-residual of the error transform E = Z^-1 Ti^-1 Tj:
    [t_E, vee((R_E - R_E^T)/2)] — first-order-equal to log(E) near identity
    and (unlike the exact log, whose arccos has an infinite derivative at
    zero error) everywhere jacfwd-safe."""
    Ti = se3.pose_to_matrix(pi)
    Tj = se3.pose_to_matrix(pj)
    Z = se3.pose_to_matrix(z)
    E = se3.inverse(Z) @ se3.inverse(Ti) @ Tj
    R = E[:3, :3]
    rot = jnp.stack(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    ) * 0.5
    return jnp.concatenate([E[:3, 3], rot])


def _factor_system(pi, pj, z, w):
    """Per-factor contribution: (Jii, Jij blocks via jacfwd) -> H blocks + b."""
    r = _between_residual(pi, pj, z)
    Ji = jax.jacfwd(_between_residual, argnums=0)(pi, pj, z)  # (6, 6)
    Jj = jax.jacfwd(_between_residual, argnums=1)(pi, pj, z)
    Hii = w * Ji.T @ Ji
    Hjj = w * Jj.T @ Jj
    Hij = w * Ji.T @ Jj
    bi = w * Ji.T @ r
    bj = w * Jj.T @ r
    return Hii, Hjj, Hij, bi, bj, w * jnp.sum(r * r)


def _prior_residual(pi: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Smooth unary residual of E = Z^-1 T_i."""
    Ti = se3.pose_to_matrix(pi)
    Z = se3.pose_to_matrix(z)
    E = se3.inverse(Z) @ Ti
    R = E[:3, :3]
    rot = jnp.stack([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) * 0.5
    return jnp.concatenate([E[:3, 3], rot])


def _prior_system(pi, z, w):
    r = _prior_residual(pi, z)
    J = jax.jacfwd(_prior_residual, argnums=0)(pi, z)
    return w * J.T @ J, w * J.T @ r, w * jnp.sum(r * r)


def _assemble(poses6: jnp.ndarray, factors: PoseGraphFactors, k: int, priors=None):
    """Dense normal system H (6K, 6K), b (6K,) from a shard of factors."""
    pi = poses6[factors.i]
    pj = poses6[factors.j]
    Hii, Hjj, Hij, bi, bj, cost = jax.vmap(_factor_system)(pi, pj, factors.z, factors.weight)

    H = jnp.zeros((k, k, 6, 6))
    b = jnp.zeros((k, 6))
    H = H.at[factors.i, factors.i].add(Hii)
    H = H.at[factors.j, factors.j].add(Hjj)
    H = H.at[factors.i, factors.j].add(Hij)
    H = H.at[factors.j, factors.i].add(jnp.swapaxes(Hij, -1, -2))
    b = b.at[factors.i].add(bi)
    b = b.at[factors.j].add(bj)
    total_cost = jnp.sum(cost)

    if priors is not None:
        Hp, bp, cp = jax.vmap(_prior_system)(poses6[priors.i], priors.z, priors.weight)
        H = H.at[priors.i, priors.i].add(Hp)
        b = b.at[priors.i].add(bp)
        total_cost = total_cost + jnp.sum(cp)
    return H, b, total_cost


def solve_pose_graph(
    poses6: jnp.ndarray,  # (K, 6) initial poses
    factors: PoseGraphFactors,
    n_iters: int = 10,
    damping: float = 1e-6,
    anchor_index: int = 0,
    anchor_weight: float = 1e6,
    mesh: Optional[Mesh] = None,
    axis: str = "data",
    priors: Optional[PosePriors] = None,
):
    """Gauss-Newton pose-graph optimization. With ``mesh``, factors shard
    across devices and partial systems reduce with psum over ICI.

    Returns (refined (K, 6), final cost scalar).
    """
    k = poses6.shape[0]

    def gn_body(_, carry):
        poses, cost = carry
        if mesh is not None:
            from jax.experimental.shard_map import shard_map

            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(P(), PoseGraphFactors(P(axis), P(axis), P(axis), P(axis))),
                out_specs=(P(), P(), P()),
            )
            def sharded_assemble(p, f):
                H, b, c = _assemble(p, f, k)
                return (
                    jax.lax.psum(H, axis),
                    jax.lax.psum(b, axis),
                    jax.lax.psum(c, axis),
                )

            H, b, cost = sharded_assemble(poses, factors)
            if priors is not None:  # priors are tiny; assemble replicated
                Hp, bp, cp = jax.vmap(_prior_system)(poses[priors.i], priors.z, priors.weight)
                H = H.at[priors.i, priors.i].add(Hp)
                b = b.at[priors.i].add(bp)
                cost = cost + jnp.sum(cp)
        else:
            H, b, cost = _assemble(poses, factors, k, priors)

        # anchor prior pins the gauge
        H = H.at[anchor_index, anchor_index].add(anchor_weight * jnp.eye(6))

        Hd = H.transpose(0, 2, 1, 3).reshape(6 * k, 6 * k)
        bd = b.reshape(6 * k)
        Hd = Hd + damping * jnp.eye(6 * k)
        delta = jnp.linalg.solve(Hd, -bd).reshape(k, 6)

        # direct parameter update: the Jacobians are w.r.t. the raw se3
        # 6-vectors (jacfwd over pose_to_matrix), so the GN step lives in
        # that chart — a right-perturbation retraction here would mismatch
        # the Jacobian and can diverge on loopy graphs
        return poses + delta, cost

    @jax.jit
    def run(poses):
        return jax.lax.fori_loop(0, n_iters, gn_body, (poses, jnp.asarray(0.0)))

    return run(poses6)


def odometry_factors_from_tracking(tracked_poses: np.ndarray, weight: float = 1.0):
    """Consecutive between-factors from the tracker's trajectory."""
    edges = []
    for i in range(len(tracked_poses) - 1):
        z = np.linalg.inv(tracked_poses[i]) @ tracked_poses[i + 1]
        edges.append((i, i + 1, z, weight))
    return edges
