import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.models import kinematics as kin
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from tests.reference_oracle import load_reference_body

Body, Quaternion = load_reference_body()


def _two_type_system(seed=0):
    rng = np.random.default_rng(seed)
    ref_a = rng.uniform(-0.5, 0.5, (4, 3))
    ref_b = rng.uniform(-0.8, 0.8, (7, 3))
    types = (
        BodyType(name="a", ref_config=ref_a, count=3),
        BodyType(name="b", ref_config=ref_b, count=2),
    )
    system = System(types=types, eta=1.1, blob_radius=0.3)
    pos = rng.uniform(-1, 1, (5, 3))
    pos[:, 2] = rng.uniform(1.0, 3.0, 5)
    quat = rng.normal(size=(5, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return system, make_state(pos, quat)


def _reference_bodies(system, state):
    bodies = []
    for i, t in enumerate(system.types):
        sl = system.body_slice(i)
        for k in range(t.count):
            loc = np.asarray(state.pos[sl])[k]
            q = Quaternion(np.asarray(state.quat[sl])[k])
            bodies.append(Body(loc, q, np.array(t.ref_config), system.blob_radius))
    return bodies


def test_blob_positions_match_reference():
    system, state = _two_type_system()
    ours = np.asarray(kin.blob_positions(system, state))
    bodies = _reference_bodies(system, state)
    ref = np.concatenate([b.get_r_vectors() for b in bodies], axis=0)
    assert np.allclose(ours, ref, atol=1e-13)


def test_K_products_match_reference_dense_K():
    system, state = _two_type_system(seed=1)
    bodies = _reference_bodies(system, state)
    Ks = [b.calc_K_matrix() for b in bodies]
    rng = np.random.default_rng(2)
    U = rng.normal(size=(system.num_bodies, 6))
    lam = rng.normal(size=(system.num_blobs, 3))

    # K U
    ours_KU = np.asarray(kin.K_mul(system, state, jnp.asarray(U)))
    ref_KU = np.concatenate([
        (K @ U[k]).reshape(-1, 3) for k, K in enumerate(Ks)], axis=0)
    assert np.allclose(ours_KU, ref_KU, atol=1e-12)

    # K^T lam
    ours_KT = np.asarray(kin.KT_mul(system, state, jnp.asarray(lam)))
    offsets = np.cumsum([0] + [b.Nblobs for b in bodies])
    ref_KT = np.stack([
        K.T @ lam[offsets[k]:offsets[k + 1]].ravel()
        for k, K in enumerate(Ks)], axis=0)
    assert np.allclose(ours_KT, ref_KT, atol=1e-12)

    # dense K builder
    idx = 0
    for i, t in enumerate(system.types):
        Kt = np.asarray(kin.K_dense(system, state, i))
        for c in range(t.count):
            assert np.allclose(Kt[c], Ks[idx], atol=1e-12)
            idx += 1


def test_adjointness_of_K_products():
    system, state = _two_type_system(seed=3)
    rng = np.random.default_rng(4)
    U = jnp.asarray(rng.normal(size=(system.num_bodies, 6)))
    lam = jnp.asarray(rng.normal(size=(system.num_blobs, 3)))
    lhs = jnp.vdot(kin.K_mul(system, state, U), lam)
    rhs = jnp.vdot(U, kin.KT_mul(system, state, lam))
    assert np.isclose(float(lhs), float(rhs), atol=1e-12)


def test_valid_configuration_and_wall_check():
    system, state = _two_type_system(seed=5)
    assert bool(kin.valid_configuration(system, state))
    low = make_state(np.asarray(state.pos) - np.array([0, 0, 10.0]),
                     np.asarray(state.quat))
    assert not bool(kin.valid_configuration(system, low))
    bodies = _reference_bodies(system, state)
    assert all(b.check_function() for b in bodies)


def test_active_slip_rotation():
    rng = np.random.default_rng(6)
    ref = rng.uniform(-0.5, 0.5, (4, 3))
    slip = rng.normal(size=(4, 3))
    t = BodyType(name="s", ref_config=ref, count=2, slip_ref=slip)
    system = System(types=(t,))
    pos = rng.normal(size=(2, 3))
    quat = rng.normal(size=(2, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    state = make_state(pos, quat)
    ours = np.asarray(kin.active_slip(system, state)).reshape(2, 4, 3)
    for k in range(2):
        R = Quaternion(quat[k]).rotation_matrix()
        assert np.allclose(ours[k], slip @ R.T, atol=1e-13)


def test_advance_matches_reference_euler_update():
    system, state = _two_type_system(seed=7)
    rng = np.random.default_rng(8)
    U = rng.normal(size=(system.num_bodies, 6))
    dt = 0.017
    new = kin.advance(state, jnp.asarray(U), dt)
    bodies = _reference_bodies(system, state)
    for k, b in enumerate(bodies):
        loc_ref = b.location + U[k, :3] * dt
        q_ref = Quaternion.from_rotation(U[k, 3:] * dt) * b.orientation
        assert np.allclose(np.asarray(new.pos)[k], loc_ref, atol=1e-13)
        assert np.allclose(np.asarray(new.quat)[k], q_ref.entries, atol=1e-13)
