"""SO(3)/SE(3) Lie-group exponential maps for pose refinement.

TPU-native port of the BARF camera math (reference: barf/camera.py:65-156).
The reference builds exp maps from 10-term Taylor series so autograd stays
stable near theta=0; we use the same construction — jax.grad differentiates
through it cleanly and it is branch-free (good for jit).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w):
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix (camera.py:117-128)."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack([
        jnp.stack([O, -w2, w1], axis=-1),
        jnp.stack([w2, O, -w0], axis=-1),
        jnp.stack([-w1, w0, O], axis=-1),
    ], axis=-2)


def _taylor_A_sq(x2, nth: int = 10):
    """sin(x)/x as a series in x^2 (camera.py:130-138). Taking x^2 directly
    keeps the zero-rotation gradient finite — no sqrt(0) in the graph."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    term = jnp.ones_like(x2)
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + ((-1.0) ** i) * term / denom
        term = term * x2
    return ans


def _taylor_B_sq(x2, nth: int = 10):
    """(1-cos(x))/x^2 as a series in x^2 (camera.py:140-147)."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    term = jnp.ones_like(x2)
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + ((-1.0) ** i) * term / denom
        term = term * x2
    return ans


def _taylor_C_sq(x2, nth: int = 10):
    """(x-sin(x))/x^3 as a series in x^2 (camera.py:149-156)."""
    ans = jnp.zeros_like(x2)
    denom = 1.0
    term = jnp.ones_like(x2)
    for i in range(nth + 1):
        denom *= (2 * i + 2) * (2 * i + 3)
        ans = ans + ((-1.0) ** i) * term / denom
        term = term * x2
    return ans


def taylor_A(x, nth: int = 10):
    return _taylor_A_sq(x * x, nth)


def taylor_B(x, nth: int = 10):
    return _taylor_B_sq(x * x, nth)


def taylor_C(x, nth: int = 10):
    return _taylor_C_sq(x * x, nth)


def so3_to_SO3(w):
    """Rodrigues via Taylor series: [..., 3] -> [..., 3, 3]
    (camera.py:70-77)."""
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = _taylor_A_sq(theta_sq)
    B = _taylor_B_sq(theta_sq)
    return I + A * wx + B * (wx @ wx)


def se3_to_SE3(wu):
    """[..., 6] (rotation w | translation u) -> [..., 3, 4]
    (camera.py:91-102)."""
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = _taylor_A_sq(theta_sq)
    B = _taylor_B_sq(theta_sq)
    C = _taylor_C_sq(theta_sq)
    R = I + A * wx + B * (wx @ wx)
    V = I + B * wx + C * (wx @ wx)
    t = (V @ u[..., None])
    return jnp.concatenate([R, t], axis=-1)


def compose_pose(pose_a, pose_b):
    """pose_new(x) = pose_b(pose_a(x)); both [..., 3, 4]
    (camera.py:40-62: compose_pair)."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R = R_b @ R_a
    t = R_b @ t_a + t_b
    return jnp.concatenate([R, t], axis=-1)


def apply_refinement(se3_refine, poses):
    """Left-compose a learned se(3) correction onto cam2world poses
    (reference camera_optimizers.py:102-105: refined = exp(se3) ∘ pose).

    The correction acts in CAMERA space: refined = pose ∘ exp(se3)
    (camera.pose.compose([pose_refine, poses]) folds to
    R_pose @ R_refine with compose_pair's b∘a semantics).

    Args:
      se3_refine: [N, 6]
      poses: [N, 3, 4] or [N, 4, 4]
    Returns: [N, 3, 4]
    """
    refine = se3_to_SE3(se3_refine)
    return compose_pose(refine, poses[..., :3, :4])


def rotation_distance(R1, R2, eps: float = 1e-7):
    """Angle between rotations (reference barf/pose_analysis.py /
    pose_eval.py rotation_distance)."""
    R_diff = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1) / 2, -1 + eps, 1 - eps))


def procrustes_analysis(X0, X1):
    """Similarity transform aligning point sets [N, 3] -> dict of
    (t0, t1, s0, s1, R) (reference camera.py:400-418). Used by the pose
    evaluation to pre-align refined cameras with ground truth."""
    t0 = X0.mean(axis=0, keepdims=True)
    t1 = X1.mean(axis=0, keepdims=True)
    X0c, X1c = X0 - t0, X1 - t1
    s0 = jnp.sqrt((X0c ** 2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c ** 2).sum(axis=-1).mean())
    X0n, X1n = X0c / s0, X1c / s1
    U, _, Vt = jnp.linalg.svd((X0n.T @ X1n), full_matrices=False)
    R = U @ Vt
    # keep a proper rotation
    det = jnp.linalg.det(R)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ D @ Vt
    return dict(t0=t0[0], t1=t1[0], s0=s0, s1=s1, R=R)
