import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import quaternion as quat


def _np_rotation_matrix(q):
    """Independent numpy rotation matrix via the standard formula."""
    s, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - s * z), 2 * (x * z + s * y)],
        [2 * (x * y + s * z), 1 - 2 * (x * x + z * z), 2 * (y * z - s * x)],
        [2 * (x * z - s * y), 2 * (y * z + s * x), 1 - 2 * (x * x + y * y)],
    ])


def test_identity_and_multiply():
    q = quat.identity()
    r = quat.normalize(jnp.array([0.3, -0.5, 0.7, 0.1]))
    assert np.allclose(quat.multiply(q, r), r)
    assert np.allclose(quat.multiply(r, quat.inverse(r)), quat.identity(), atol=1e-14)


def test_rotation_matrix_matches_standard_form():
    rng = np.random.default_rng(0)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = np.asarray(quat.rotation_matrix(jnp.asarray(q)))
        assert np.allclose(R, _np_rotation_matrix(q), atol=1e-13)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-13)
        assert np.isclose(np.linalg.det(R), 1.0)


def test_from_rotation_exp_map():
    # rotation of pi/2 about z maps x->y
    phi = jnp.array([0.0, 0.0, np.pi / 2])
    q = quat.from_rotation(phi)
    R = quat.rotation_matrix(q)
    assert np.allclose(R @ jnp.array([1.0, 0, 0]), [0, 1, 0], atol=1e-14)
    # zero rotation is the identity, smooth (no NaN)
    q0 = quat.from_rotation(jnp.zeros(3))
    assert np.allclose(q0, [1, 0, 0, 0])
    g = jax.jacfwd(quat.from_rotation)(jnp.zeros(3))
    assert np.all(np.isfinite(g))


def test_rotation_composition_matches_matrix_product():
    rng = np.random.default_rng(1)
    q1 = quat.normalize(jnp.asarray(rng.normal(size=4)))
    q2 = quat.normalize(jnp.asarray(rng.normal(size=4)))
    R = quat.rotation_matrix(quat.multiply(q1, q2))
    R12 = quat.rotation_matrix(q1) @ quat.rotation_matrix(q2)
    assert np.allclose(R, R12, atol=1e-13)


def test_rotate_agrees_with_matrix():
    rng = np.random.default_rng(2)
    q = quat.normalize(jnp.asarray(rng.normal(size=(5, 4))))
    x = jnp.asarray(rng.normal(size=(5, 3)))
    rx = quat.rotate(q, x)
    Rx = jnp.einsum("bij,bj->bi", quat.rotation_matrix(q), x)
    assert np.allclose(rx, Rx, atol=1e-13)


def test_norm_stable_under_many_products():
    # analogue of the reference's 1e6-product norm stability test
    q = quat.normalize(jnp.array([1.0, 2.0, 3.0, 4.0]))
    step = quat.from_rotation(jnp.array([1e-3, -2e-3, 0.5e-3]))

    def body(carry, _):
        return quat.multiply(step, carry), None

    out, _ = jax.lax.scan(body, q, None, length=10000)
    assert np.isclose(float(jnp.linalg.norm(out)), 1.0, atol=1e-9)


def test_log_map_roundtrip():
    rng = np.random.default_rng(3)
    phi = jnp.asarray(rng.normal(size=(7, 3)))
    q = quat.from_rotation(phi)
    back = quat.to_rotation_vector(q)
    assert np.allclose(back, phi, atol=1e-12)


def test_step_matches_reference_update():
    omega = jnp.array([0.1, -0.2, 0.3])
    dt = 0.01
    q = quat.normalize(jnp.array([0.9, 0.1, -0.3, 0.2]))
    expected = quat.multiply(quat.from_rotation(omega * dt), q)
    assert np.allclose(quat.step(q, omega, dt), expected)
