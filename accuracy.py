#!/usr/bin/env python
"""Accelerator-accuracy harness: f32 pairwise mobility products on the
default backend (TPU on the bench host) vs the f64 CPU oracle at bench
scale.

The kernel-parity tests in tests/ run at 1e-12 on CPU f64; this script
closes the remaining question — what the *f32 TPU* fast path loses at
production sizes — by evaluating u = M v for all four couplings of the
single-wall RPY/Blake mobility at N blobs on the accelerator (f32, this
process) and on the CPU in float64 (subprocess: enabling x64 globally
breaks the TPU client, so the oracle is isolated), and reporting
relative L2 errors.

Prints one JSON line:
  {"backend": ..., "n_blobs": ..., "rel_err": {"tt": ..., ...}}

Used by tests/test_tpu_accuracy.py (skipped when no accelerator is
present) and recorded in ACCURACY.md.
"""

import json
import os
import subprocess
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)

N_BLOBS = int(os.environ.get("ACCURACY_BLOBS", 3072))
ETA, A = 1.0, 0.131
COUPLINGS = ("tt", "rt", "tr", "rr")


def _config(n):
    import numpy as np

    rng = np.random.default_rng(0)
    side = int(np.ceil(n ** (1 / 3)))
    idx = np.arange(n)
    r = np.stack([(idx % side) * 0.4,
                  ((idx // side) % side) * 0.4,
                  0.5 + (idx // (side * side)) * 0.4], axis=1)
    r += rng.uniform(-0.05, 0.05, size=r.shape)
    v = rng.normal(size=(n, 3))
    return r, v


N_SPECTRAL = int(os.environ.get("ACCURACY_SPECTRAL_BLOBS", 2048))
SPECTRAL_TOL = float(os.environ.get("ACCURACY_SPECTRAL_TOL", 1e-4))


def _spectral_setup(n):
    """Periodic-box configuration + params shared by oracle and fast
    path (bench-like density: ~1 blob per 0.4^3)."""
    import numpy as np

    from rigidmultiblobswall_tpu.ops import ewald

    rng = np.random.default_rng(1)
    L = 0.4 * int(np.ceil(n ** (1 / 3)))
    r = rng.uniform(0.0, L, size=(n, 3))
    v = rng.normal(size=(n, 3))
    p = ewald.default_params(A, ETA, (L, L, L), tol=SPECTRAL_TOL,
                             grid_max=128)
    return r, v, p


def _oracle(out_path):
    """Subprocess entry: CPU f64 reference products -> npz."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from rigidmultiblobswall_tpu.ops import ewald
    from rigidmultiblobswall_tpu.ops.mobility import pairwise_matvec

    r, v = _config(N_BLOBS)
    out = {}
    for coupling in COUPLINGS:
        out[coupling] = np.asarray(pairwise_matvec(
            jnp.asarray(r, jnp.float64), jnp.asarray(r, jnp.float64),
            jnp.asarray(v, jnp.float64), ETA, A, coupling=coupling,
            domain="single_wall"))
    rs, vs, p = _spectral_setup(N_SPECTRAL)
    plan = ewald.make_plan(p, jnp.asarray(rs, jnp.float64))
    out["spectral"] = np.asarray(ewald.matvec(plan, jnp.asarray(
        vs, jnp.float64)))
    np.savez(out_path, **out)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rigidmultiblobswall_tpu.ops.mobility import pairwise_matvec

    with tempfile.TemporaryDirectory() as td:
        ref_path = os.path.join(td, "oracle.npz")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--oracle", ref_path], check=True, env=env)
        ref = np.load(ref_path)

        r, v = _config(N_BLOBS)
        rel = {}
        for coupling in COUPLINGS:
            fast = np.asarray(pairwise_matvec(
                jnp.asarray(r, jnp.float32), jnp.asarray(r, jnp.float32),
                jnp.asarray(v, jnp.float32), ETA, A, coupling=coupling,
                domain="single_wall"))
            rel[coupling] = float(
                np.linalg.norm(fast - ref[coupling])
                / np.linalg.norm(ref[coupling]))

        # spectral Ewald engine: f32 accelerator matvec vs the f64 CPU
        # engine (itself oracle-verified in tests/test_ewald.py)
        from rigidmultiblobswall_tpu.ops import ewald

        rs, vs, p = _spectral_setup(N_SPECTRAL)
        plan = ewald.make_plan(p, jnp.asarray(rs, jnp.float32))
        fast = np.asarray(ewald.matvec(plan, jnp.asarray(vs, jnp.float32)))
        rel["spectral"] = float(np.linalg.norm(fast - ref["spectral"])
                                / np.linalg.norm(ref["spectral"]))

        print(json.dumps({"backend": jax.default_backend(),
                          "n_blobs": N_BLOBS,
                          "n_blobs_spectral": N_SPECTRAL,
                          "spectral_tol": SPECTRAL_TOL,
                          "rel_err": rel}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--oracle":
        _oracle(sys.argv[2])
    else:
        main()
