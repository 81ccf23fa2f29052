"""Vectorized unit-quaternion kinematics.

Quaternions are arrays of shape (..., 4) with scalar-first layout
q = (s, p1, p2, p3). All functions are pure, jit/vmap friendly and operate
on arbitrary leading batch dimensions.

Semantics match the reference implementation
(/root/reference/quaternion_integrator/quaternion.py:7-84): the exp-map
`from_rotation(phi)` builds q = (cos|phi|/2, sin(|phi|/2) phi_hat) and the
rotation matrix uses the 2*(s^2 - 1/2) diagonal form.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(batch_shape=(), dtype=jnp.float64):
    """Identity quaternion(s) with shape batch_shape + (4,)."""
    q = jnp.zeros(tuple(batch_shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def multiply(q, r):
    """Hamilton product q*r for scalar-first quaternions, shape (...,4)."""
    qs, qv = q[..., :1], q[..., 1:]
    rs, rv = r[..., :1], r[..., 1:]
    s = qs * rs - jnp.sum(qv * rv, axis=-1, keepdims=True)
    v = qs * rv + rs * qv + jnp.cross(qv, rv)
    return jnp.concatenate([s, v], axis=-1)


def inverse(q):
    """Inverse (= conjugate) of unit quaternion(s)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_rotation(phi):
    """Exp-map: rotation vector(s) phi (...,3) -> unit quaternion(s) (...,4).

    q = (cos(|phi|/2), sin(|phi|/2) * phi/|phi|). Smooth at phi=0 via
    the sinc form p = (phi/2) * sinc(|phi|/2 / pi).
    """
    n2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    # safe norm: keeps gradients finite at phi = 0
    norm = jnp.where(n2 == 0.0, 0.0, jnp.sqrt(jnp.where(n2 == 0.0, 1.0, n2)))
    half = 0.5 * norm
    s = jnp.cos(half)
    # sin(half)/half, smooth at 0: jnp.sinc(x) = sin(pi x)/(pi x)
    p = 0.5 * phi * jnp.sinc(half / jnp.pi)
    return jnp.concatenate([s, p], axis=-1)


def to_rotation_vector(q):
    """Log-map: unit quaternion(s) -> rotation vector(s) (...,3)."""
    s = jnp.clip(q[..., :1], -1.0, 1.0)
    p = q[..., 1:]
    pnorm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(pnorm, s)
    scale = jnp.where(pnorm > 1e-30, angle / jnp.maximum(pnorm, 1e-30), 2.0)
    return scale * p


def rotation_matrix(q):
    """Rotation matrix R (...,3,3) of unit quaternion(s) (...,4).

    Rotating a body-frame vector x to the lab frame is R @ x.
    """
    s = q[..., 0]
    p0, p1, p2 = q[..., 1], q[..., 2], q[..., 3]
    d = s * s - 0.5
    r00 = p0 * p0 + d
    r11 = p1 * p1 + d
    r22 = p2 * p2 + d
    r01 = p0 * p1 - s * p2
    r10 = p0 * p1 + s * p2
    r02 = p0 * p2 + s * p1
    r20 = p0 * p2 - s * p1
    r12 = p1 * p2 - s * p0
    r21 = p1 * p2 + s * p0
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return 2.0 * jnp.stack(rows, axis=-2)


def rotate(q, x):
    """Rotate vector(s) x (...,3) by quaternion(s) q (...,4)."""
    qv = q[..., 1:]
    s = q[..., :1]
    t = 2.0 * jnp.cross(qv, x)
    return x + s * t + jnp.cross(qv, t)


def random(key, batch_shape=(), dtype=jnp.float64):
    """Uniformly random unit quaternion(s) (Haar measure on SO(3))."""
    import jax

    v = jax.random.normal(key, tuple(batch_shape) + (4,), dtype=dtype)
    return normalize(v)


def step(q, omega, dt):
    """Advance orientation: q_new = exp(omega*dt) * q.

    Matches the reference update q_new = Quaternion.from_rotation(w*dt) * q
    (/root/reference/quaternion_integrator/quaternion_integrator_multi_bodies.py:96-98).
    """
    return multiply(from_rotation(omega * dt), q)
