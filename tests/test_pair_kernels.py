"""Direct-block fused Pallas pair kernels vs the XLA tile engine.

Runs the kernels in interpret mode on CPU and compares every coupling
(and the fused grand product) against `mobility.pairwise_matvec`, which
itself is parity-tested at 1e-12 against the reference python oracle
(tests/test_mobility.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import mobility as mob, pair_kernels


def _scene(n=37, seed=7):
    rng = np.random.default_rng(seed)
    r = rng.uniform(0, 5, (n, 3))
    # include blobs below a (overlap-regularized) and well above the wall
    r[:, 2] = rng.uniform(0.05, 4, n)
    v = rng.normal(size=(n, 3))
    return r, v


@pytest.mark.parametrize("domain", ["single_wall", "no_wall"])
@pytest.mark.parametrize("coupling", ["tt", "tr", "rt", "rr"])
def test_pair_matvec_matches_engine(domain, coupling):
    r, v = _scene()
    a, eta = 0.3, 0.9
    wall = domain == "single_wall"
    ref = mob.pairwise_matvec(jnp.asarray(r), jnp.asarray(r), jnp.asarray(v),
                              eta, a, coupling=coupling, domain=domain,
                              method="generic")
    rr = jnp.asarray(r, jnp.float32)
    vv = jnp.asarray(v, jnp.float32)
    if wall:
        damp = mob.damping_factors(rr, a)
        rs = mob.shift_heights(rr, a)
        vin = vv * damp[:, None]
    else:
        rs, vin = rr, vv
    got = pair_kernels.pair_matvec_pallas(
        rs / a, rs / a, vin, coupling=coupling, wall=wall,
        self_interaction=True, interpret=True)
    got = got / (8.0 * np.pi * eta * a ** mob._PREF_POW[coupling])
    if wall:
        got = got * damp[:, None]
    ref = np.asarray(ref)
    scale = np.abs(ref).max()
    assert np.allclose(np.asarray(got), ref, atol=3e-6 * scale)


@pytest.mark.parametrize("domain", ["single_wall", "no_wall"])
def test_grand_matvec_matches_four_products(domain):
    r, _ = _scene(n=29, seed=11)
    rng = np.random.default_rng(12)
    F = rng.normal(size=(29, 3))
    T = rng.normal(size=(29, 3))
    a, eta = 0.3, 0.9
    wall = domain == "single_wall"
    kw = dict(domain=domain, method="generic")
    u_ref = np.asarray(mob.mobility_trans_times_force_torque(
        jnp.asarray(r), jnp.asarray(F), jnp.asarray(T), eta, a, **kw))
    w_ref = np.asarray(mob.mobility_rot_times_force_torque(
        jnp.asarray(r), jnp.asarray(F), jnp.asarray(T), eta, a, **kw))

    rr = jnp.asarray(r, jnp.float32)
    Fd = jnp.asarray(F, jnp.float32)
    Td = jnp.asarray(T, jnp.float32)
    if wall:
        damp = mob.damping_factors(rr, a)
        rs = mob.shift_heights(rr, a)
        Fd = Fd * damp[:, None]
        Td = Td * damp[:, None]
    else:
        rs = rr
    vin = jnp.concatenate([Fd, Td / a], axis=1)
    out = pair_kernels.pair_matvec_pallas(
        rs / a, rs / a, vin, coupling="grand", wall=wall,
        self_interaction=True, interpret=True)
    u = out[:, :3] / (8.0 * np.pi * eta * a)
    w = out[:, 3:] / (8.0 * np.pi * eta * a * a)
    if wall:
        u = u * damp[:, None]
        w = w * damp[:, None]
    assert np.allclose(np.asarray(u), u_ref, atol=5e-6 * np.abs(u_ref).max())
    assert np.allclose(np.asarray(w), w_ref, atol=5e-6 * np.abs(w_ref).max())


def test_source_target_rectangular():
    """Non-square product (targets != sources), no self interaction."""
    rng = np.random.default_rng(21)
    src = rng.uniform(0, 4, (23, 3))
    src[:, 2] += 0.4
    tgt = rng.uniform(0, 4, (15, 3))
    tgt[:, 2] += 0.4
    v = rng.normal(size=(23, 3))
    a, eta = 0.25, 1.1
    ref = mob.pairwise_matvec(jnp.asarray(src), jnp.asarray(tgt),
                              jnp.asarray(v), eta, a, coupling="tt",
                              domain="single_wall", self_interaction=False,
                              method="generic")
    rs = mob.shift_heights(jnp.asarray(src, jnp.float32), a)
    rt = mob.shift_heights(jnp.asarray(tgt, jnp.float32), a)
    damp_s = mob.damping_factors(jnp.asarray(src, jnp.float32), a)
    damp_t = mob.damping_factors(jnp.asarray(tgt, jnp.float32), a)
    vin = jnp.asarray(v, jnp.float32) * damp_s[:, None]
    got = pair_kernels.pair_matvec_pallas(
        rs / a, rt / a, vin, coupling="tt", wall=True,
        self_interaction=False, interpret=True)
    got = got / (8.0 * np.pi * eta * a) * damp_t[:, None]
    ref = np.asarray(ref)
    assert np.allclose(np.asarray(got), ref, atol=3e-6 * np.abs(ref).max())


@pytest.mark.parametrize("coupling", ["tt", "grand"])
def test_pair_matvec_multi_rhs_matches_singles(coupling):
    """Stacked RHS columns (shared condensed coefficients) reproduce the
    per-column products exactly."""
    r, _ = _scene(n=29, seed=11)
    rng = np.random.default_rng(12)
    nin = 6 if coupling == "grand" else 3
    V = rng.normal(size=(29, 2 * nin))
    rr = jnp.asarray(r, jnp.float32) / 0.3
    singles = [np.asarray(pair_kernels.pair_matvec_pallas(
        rr, rr, jnp.asarray(V[:, b * nin:(b + 1) * nin], jnp.float32),
        coupling=coupling, wall=True, self_interaction=True,
        interpret=True)) for b in range(2)]
    multi = np.asarray(pair_kernels.pair_matvec_pallas(
        rr, rr, jnp.asarray(V, jnp.float32), coupling=coupling, wall=True,
        self_interaction=True, interpret=True))
    nout = singles[0].shape[1]
    scale = max(np.abs(s).max() for s in singles)
    for b in range(2):
        np.testing.assert_allclose(multi[:, b * nout:(b + 1) * nout],
                                   singles[b], atol=1e-6 * scale)
