import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import mobility as mob
from tests.reference_oracle import load_reference_mobility

REF = load_reference_mobility()

ETA = 1.37
A = 0.412


def _random_config(n, seed=0, zmin=None):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-2.0, 2.0, (n, 3))
    r[:, 2] = rng.uniform(zmin if zmin is not None else 1.5 * A, 4.0, n)
    return r


def _dense_from_matvec(r, coupling, domain, **kw):
    """Materialize the matvec operator by vmapping over unit vectors."""
    import jax

    n = r.shape[0]
    rj = jnp.asarray(r)

    @jax.jit
    def cols(vs):
        return jax.vmap(
            lambda v: mob.pairwise_matvec(rj, rj, v.reshape(n, 3), ETA, A,
                                          coupling=coupling, domain=domain,
                                          **kw).ravel()
        )(vs)

    return np.asarray(cols(jnp.eye(3 * n))).T


# ---------------------------------------------------------------------------
# Golden parity vs the reference's pure-python dense builders
# ---------------------------------------------------------------------------

def test_rotne_prager_dense_matches_reference():
    r = _random_config(8, seed=1)
    ours = np.asarray(mob.rotne_prager_tensor(jnp.asarray(r), ETA, A))
    ref = REF.rotne_prager_tensor(r, ETA, A)
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)


def test_rotne_prager_dense_overlapping_blobs():
    # include blobs closer than 2a (near-field RPY branch)
    rng = np.random.default_rng(2)
    r = rng.uniform(0.0, 1.5 * A, (10, 3))
    r[:, 2] += 3 * A
    ours = np.asarray(mob.rotne_prager_tensor(jnp.asarray(r), ETA, A))
    ref = REF.rotne_prager_tensor(r, ETA, A)
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)


def test_single_wall_dense_matches_reference():
    r = _random_config(8, seed=3)
    ours = np.asarray(mob.single_wall_fluid_mobility(jnp.asarray(r), ETA, A))
    ref = REF.single_wall_fluid_mobility(r, ETA, A)
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)


def test_single_wall_dense_with_overlap_regularization():
    # blobs partially below z = a trigger shift+damping
    r = _random_config(9, seed=4)
    r[::3, 2] = np.random.default_rng(5).uniform(0.05 * A, 0.9 * A, 3)
    ours = np.asarray(mob.single_wall_fluid_mobility(jnp.asarray(r), ETA, A))
    ref = REF.single_wall_fluid_mobility(r, ETA, A)
    assert np.allclose(ours, ref, rtol=0, atol=1e-12)
    # regularized mobility must stay positive definite
    assert np.linalg.eigvalsh(ours).min() > 0


# ---------------------------------------------------------------------------
# Matvec drivers vs dense materialization
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("coupling", ["tt", "tr", "rt", "rr"])
@pytest.mark.parametrize("domain", ["no_wall", "single_wall"])
def test_matvec_matches_dense(coupling, domain):
    r = _random_config(7, seed=6)
    rng = np.random.default_rng(7)
    v = rng.normal(size=(7, 3))
    u = mob.pairwise_matvec(
        jnp.asarray(r), jnp.asarray(r), jnp.asarray(v), ETA, A,
        coupling=coupling, domain=domain,
    )
    dense = np.asarray(mob.dense_mobility(jnp.asarray(r), ETA, A,
                                          domain=domain, coupling=coupling))
    expected = dense @ v.ravel()
    assert np.allclose(np.asarray(u).ravel(), expected, atol=1e-12)


def test_row_tiling_invariance():
    r = _random_config(13, seed=8)
    rng = np.random.default_rng(9)
    v = rng.normal(size=(13, 3))
    u_full = mob.mobility_trans_times_force(jnp.asarray(r), jnp.asarray(v),
                                            ETA, A, row_tile=13)
    u_tiled = mob.mobility_trans_times_force(jnp.asarray(r), jnp.asarray(v),
                                             ETA, A, row_tile=4)
    assert np.allclose(u_full, u_tiled, atol=1e-13)


# ---------------------------------------------------------------------------
# Physics invariants (constrain the wall cross corrections)
# ---------------------------------------------------------------------------

def test_grand_mobility_symmetry_single_wall():
    """The grand mobility is symmetric: the trans-torque block must be the
    transpose of the rot-force block, and tt/rr blocks symmetric."""
    r = _random_config(6, seed=10)
    m_tt = _dense_from_matvec(r, "tt", "single_wall")
    m_rr = _dense_from_matvec(r, "rr", "single_wall")
    m_tr = _dense_from_matvec(r, "tr", "single_wall")
    m_rt = _dense_from_matvec(r, "rt", "single_wall")
    assert np.allclose(m_tt, m_tt.T, atol=1e-12)
    assert np.allclose(m_rr, m_rr.T, atol=1e-12)
    # units: m_tr and m_rt both carry 1/(8 pi eta a^2) so blocks match directly
    assert np.allclose(m_tr, m_rt.T, atol=1e-12)


def test_grand_mobility_spd_single_wall():
    r = _random_config(6, seed=11)
    m_tt = _dense_from_matvec(r, "tt", "single_wall")
    m_rr = _dense_from_matvec(r, "rr", "single_wall")
    m_tr = _dense_from_matvec(r, "tr", "single_wall")
    m_rt = _dense_from_matvec(r, "rt", "single_wall")
    # physical grand mobility needs the a-normalization restored
    grand = np.block([[m_tt / A, m_tr / A**2], [m_rt / A**2, m_rr / A**3]])
    eigs = np.linalg.eigvalsh(grand * A**3)
    assert eigs.min() > 0


def test_wall_corrections_vanish_far_away():
    r = _random_config(5, seed=12)
    r[:, 2] += 1e9  # wall corrections decay like a/z
    rng = np.random.default_rng(13)
    v = rng.normal(size=(5, 3))
    for coupling in ["tt", "tr", "rt", "rr"]:
        u_wall = mob.pairwise_matvec(jnp.asarray(r), jnp.asarray(r),
                                     jnp.asarray(v), ETA, A,
                                     coupling=coupling, domain="single_wall")
        u_free = mob.pairwise_matvec(jnp.asarray(r), jnp.asarray(r),
                                     jnp.asarray(v), ETA, A,
                                     coupling=coupling, domain="no_wall")
        assert np.allclose(u_wall, u_free, atol=1e-8)


def test_mobility_near_wall_slower_than_bulk():
    # a single blob near the wall must have smaller self-mobility
    r = np.array([[0.0, 0.0, 1.2 * A]])
    f = np.array([[1.0, 0.0, 0.0]])
    u_wall = mob.mobility_trans_times_force(jnp.asarray(r), jnp.asarray(f), ETA, A)
    u_free = mob.mobility_trans_times_force(jnp.asarray(r), jnp.asarray(f),
                                            ETA, A, domain="no_wall")
    assert 0 < float(u_wall[0, 0]) < float(u_free[0, 0])


# ---------------------------------------------------------------------------
# Pseudo-periodic images
# ---------------------------------------------------------------------------

def test_periodic_minimum_image_brute_force():
    """Compare the engine's periodic handling against an explicit numpy
    implementation of min-image + neighbor box sweep for the no-wall TT
    kernel."""
    L = np.array([5.0, 4.0, 0.0])
    rng = np.random.default_rng(14)
    n = 6
    r = rng.uniform(0, 4, (n, 3))
    v = rng.normal(size=(n, 3))

    u = np.asarray(mob.mobility_trans_times_force(
        jnp.asarray(r), jnp.asarray(v), ETA, A, domain="no_wall",
        periodic_length=tuple(L)))

    # brute force oracle
    def rpy_block(d):
        r2 = d @ d
        if r2 == 0:
            return (4.0 / 3.0) * np.eye(3)
        rr = np.sqrt(r2)
        if rr > 2:
            c1 = (1 + 2 / (3 * r2)) / rr
            c2 = (1 - 2 / r2) / r2 / rr
        else:
            c1 = (4 / 3) * (1 - 9 * rr / 32)
            c2 = (4 / 3) * (3 / 32) / rr
        return c1 * np.eye(3) + c2 * np.outer(d, d)

    expected = np.zeros((n, 3))
    boxes = [(bx, by, 0) for bx in (-1, 0, 1) for by in (-1, 0, 1)]
    for i in range(n):
        for j in range(n):
            dphys = r[i] - r[j]
            for axis in range(3):
                if L[axis] > 0:
                    c = dphys[axis]
                    dphys[axis] = c - np.trunc(c / L[axis] + 0.5 * np.sign(c)) * L[axis]
            for box in boxes:
                d = (dphys + np.array(box) * L) / A
                if i == j and box == (0, 0, 0):
                    blk = (4.0 / 3.0) * np.eye(3)
                else:
                    blk = rpy_block(d)
                expected[i] += blk @ v[j]
    expected /= 8 * np.pi * ETA * A
    assert np.allclose(np.asarray(u), expected, atol=1e-12)


def test_source_target_product():
    """Evaluation at targets distinct from sources (no self interaction)."""
    rng = np.random.default_rng(15)
    src = _random_config(5, seed=16)
    tgt = rng.uniform(-1, 1, (4, 3))
    tgt[:, 2] = rng.uniform(2 * A, 3.0, 4)
    f = rng.normal(size=(5, 3))
    u = mob.pairwise_matvec(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f),
                            ETA, A, coupling="tt", domain="no_wall",
                            self_interaction=False)
    # oracle: dense blocks between different points
    expected = np.zeros((4, 3))
    for i in range(4):
        for j in range(5):
            d = (tgt[i] - src[j]) / A
            r2 = d @ d
            rr = np.sqrt(r2)
            if rr > 2:
                c1 = (1 + 2 / (3 * r2)) / rr
                c2 = (1 - 2 / r2) / r2 / rr
            else:
                c1 = (4 / 3) * (1 - 9 * rr / 32)
                c2 = (4 / 3) * (3 / 32) / rr
            blk = c1 * np.eye(3) + c2 * np.outer(d, d)
            expected[i] += blk @ f[j]
    expected /= 8 * np.pi * ETA * A
    assert np.allclose(np.asarray(u), expected, atol=1e-12)
