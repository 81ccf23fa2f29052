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


def _oracle(out_path):
    """Subprocess entry: CPU f64 reference products -> npz."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from rigidmultiblobswall_tpu.ops.mobility import pairwise_matvec

    r, v = _config(N_BLOBS)
    out = {}
    for coupling in COUPLINGS:
        out[coupling] = np.asarray(pairwise_matvec(
            jnp.asarray(r, jnp.float64), jnp.asarray(r, jnp.float64),
            jnp.asarray(v, jnp.float64), ETA, A, coupling=coupling,
            domain="single_wall"))
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

        print(json.dumps({"backend": jax.default_backend(),
                          "n_blobs": N_BLOBS, "rel_err": rel}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--oracle":
        _oracle(sys.argv[2])
    else:
        main()
