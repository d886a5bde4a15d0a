"""Linear blend skinning utilities for Animatable NeRF.

Parity target: ``xrnerf/models/networks/utils/aninerf.py`` in the
reference: ``sample_closest_points`` (pytorch3d knn_points),
``pose_points_to_tpose_points`` / ``tpose_points_to_pose_points``
(blend-weighted joint-transform application), ``get_rigid_transformation``
(``datasets/utils/aninerf.py``).

TPU-first: the knn is a chunked brute-force argmin — [P, 6890] distance
tiles are a single MXU matmul (|x|^2 - 2 x.v + |v|^2) rather than a
KD-tree, which at SMPL scale is faster on TPU than any tree traversal.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def closest_vertex(
    pts: jnp.ndarray,  # [P, 3]
    verts: jnp.ndarray,  # [V, 3]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (nearest vertex index [P], squared distance [P])."""
    d2 = (
        jnp.sum(pts**2, -1, keepdims=True)
        - 2.0 * pts @ verts.T
        + jnp.sum(verts**2, -1)[None, :]
    )
    idx = jnp.argmin(d2, axis=-1)
    # the matmul trick suffers fp32 cancellation at small distances; the
    # argmin is robust but the value isn't — recompute exactly for winners
    d2_exact = jnp.sum((pts - verts[idx]) ** 2, axis=-1)
    return idx, d2_exact


def sample_blend_weights(
    pts: jnp.ndarray,  # [P, 3]
    verts: jnp.ndarray,  # [V, 3]
    vert_bw: jnp.ndarray,  # [V, J]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-vertex SMPL blend weights + distance (aninerf.py knn init)."""
    idx, d2 = closest_vertex(pts, verts)
    return vert_bw[idx], jnp.sqrt(jnp.maximum(d2, 0.0))


def batch_rodrigues(rot_vecs: jnp.ndarray) -> jnp.ndarray:
    """[J, 3] axis-angle -> [J, 3, 3] rotations (datasets/utils/aninerf.py)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(-1, 3, 3)
    eye = jnp.eye(3)[None]
    return cos * eye + (1 - cos) * axis[..., :, None] * axis[..., None, :] + sin * K


def get_rigid_transformation(
    poses: jnp.ndarray,  # [J, 3] axis-angle
    joints: jnp.ndarray,  # [J, 3] rest joints
    parents: jnp.ndarray,  # [J] kinematic tree
) -> jnp.ndarray:
    """Forward kinematics -> [J, 4, 4] world transforms A_k relative to the
    rest pose (datasets/utils/aninerf.py get_rigid_transformation)."""
    J = joints.shape[0]
    rots = batch_rodrigues(poses)
    parents = np.asarray(parents)
    rel_joints = jnp.concatenate(
        [joints[:1], joints[1:] - joints[parents[1:]]], axis=0
    )
    mats = jnp.concatenate(
        [
            jnp.concatenate([rots, rel_joints[:, :, None]], axis=-1),
            jnp.broadcast_to(jnp.asarray([0, 0, 0, 1.0]), (J, 1, 4)),
        ],
        axis=1,
    )  # [J, 4, 4]

    chains = [mats[0]]
    for k in range(1, J):
        chains.append(chains[parents[k]] @ mats[k])
    A = jnp.stack(chains)  # [J, 4, 4] posed joint transforms
    # subtract rest-pose joint contribution: A_k[:3,3] -= R_k @ j_k
    corr = jnp.einsum("jab,jb->ja", A[:, :3, :3], joints)
    A = A.at[:, :3, 3].add(-corr)
    return A


def pose_to_tpose(
    pts: jnp.ndarray, bw: jnp.ndarray, A: jnp.ndarray
) -> jnp.ndarray:
    """Posed-space points -> canonical: x_t = (sum_k w_k A_k)^{-1} x."""
    M = jnp.einsum("pj,jab->pab", bw, A)  # [P, 4, 4]
    R = M[:, :3, :3]
    t = M[:, :3, 3]
    return jnp.einsum("pab,pb->pa", jnp.linalg.inv(R), pts - t)


def tpose_to_pose(
    pts: jnp.ndarray, bw: jnp.ndarray, A: jnp.ndarray
) -> jnp.ndarray:
    """Canonical points -> posed: x = (sum_k w_k A_k) x_t."""
    M = jnp.einsum("pj,jab->pab", bw, A)
    return jnp.einsum("pab,pb->pa", M[:, :3, :3], pts) + M[:, :3, 3]
