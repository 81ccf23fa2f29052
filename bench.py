#!/usr/bin/env python
"""Benchmark: one full Brownian timestep (stochastic_Slip_Trapz, the
reference's recommended scheme: 3 PC-GMRES rigid solves + 1 Lanczos
M^{1/2}z + 2 mobility products) on the flagship many-body suspension.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: speedup over the reference's only backend available on this
host (pure python/numpy; numba/pycuda are not installed), measured here
for the same step composition. A reference Slip-Trapz step needs >= 3
dense wall-mobility constructions + ~26 matvecs; with the generous
best-case arrangement (build dense once per configuration, reuse for all
matvecs of that configuration) the measured cost at 3072 blobs on this
host is 3 x 21.9 s (dense build, mobility/mobility.py:1018) + 26 x 96 ms
(dense matvec) ~= 68.2 s. The O(N^2)/O(N^3)-scaled estimate is used for
other sizes. Override with BENCH_REF_STEP_MS. (The repo-level north star
- 50 ms at 100k blobs on v5e-8 - is tracked separately in BASELINE.md.)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from rigidmultiblobswall_tpu.models import integrators
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state

# benchmark scale (single chip): 4096 12-blob shells = 49152 blobs.
# At this size the (3N,3N) mobility cannot be materialized (87 GB); the
# step runs entirely on the matrix-free direct-block Pallas engine
# (ops/pair_kernels.py). See SCALING.md for the size sweep and the
# path to the 100k-blob north star.
N_BODIES = int(os.environ.get("BENCH_BODIES", 4096))
N_BLOBS_PER = 12
DT = 1e-3
SCHEME = os.environ.get("BENCH_SCHEME", "stochastic_Slip_Trapz")


def shell_vertices(n=12, radius=0.5):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return radius * np.stack([np.cos(theta) * np.sin(phi),
                              np.sin(theta) * np.sin(phi),
                              np.cos(phi)], axis=1)


def build():
    t = BodyType(name="shell12", ref_config=shell_vertices(N_BLOBS_PER, 0.5),
                 count=N_BODIES)
    system = System(
        types=(t,), eta=1.0, blob_radius=0.131, kT=0.05, g=0.1,
        domain="single_wall", repulsion_strength_wall=0.2,
        debye_length_wall=0.2, repulsion_strength=0.2, debye_length=0.2,
        # f32-appropriate tolerances (f64 parity is verified in tests/)
        solver_tolerance=2e-4,
    )
    # non-overlapping grid above the wall
    side = int(np.ceil(N_BODIES ** (1 / 3)))
    idx = np.arange(N_BODIES)
    spacing = 1.6
    pos = np.stack([
        (idx % side) * spacing,
        ((idx // side) % side) * spacing,
        2.0 + (idx // (side * side)) * spacing,
    ], axis=1).astype(np.float32)
    rng = np.random.default_rng(0)
    quat = rng.normal(size=(N_BODIES, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return system, make_state(pos, quat)


def main():
    system, state = build()
    n_blobs = system.num_blobs
    step = integrators.make_stepper(
        system, SCHEME, DT,
        lanczos_tolerance=5e-4, lanczos_max_iter=32, lanczos_check_every=4,
        gmres_restart=60, gmres_maxiter=300, max_rejections=3)
    carry = integrators.init_carry(system, dtype=jnp.float32)

    @jax.jit
    def jit_step(state, key, carry):
        new_state, new_carry, aux = step(state, key, carry)
        return new_state, new_carry, aux

    key = jax.random.PRNGKey(0)
    # compile + warm up
    state1, carry1, aux = jit_step(state, key, carry)
    jax.block_until_ready(state1.pos)
    # sanity: the step must be real (finite state, solver did work)
    pos1 = np.asarray(state1.pos)
    diag = dict(finite=bool(np.all(np.isfinite(pos1))),
                det_iters=int(aux.det_iterations),
                stoch_iters=int(aux.stoch_iterations),
                rejections=int(aux.rejections),
                max_disp=float(np.abs(pos1 - np.asarray(state.pos)).max()))
    print("diagnostics:", diag, file=sys.stderr)
    if not diag["finite"] or diag["det_iters"] == 0:
        print(json.dumps({"metric": "brownian_step_ms_INVALID", "value": -1,
                          "unit": "ms/step", "vs_baseline": 0.0}))
        return

    n_iters = 3
    t0 = time.perf_counter()
    s, c = state, carry
    for i in range(n_iters):
        s, c, aux = jit_step(s, jax.random.PRNGKey(i + 1), c)
    jax.block_until_ready(s.pos)
    elapsed_ms = (time.perf_counter() - t0) / n_iters * 1e3

    # measured reference-python-backend step estimate at 3072 blobs on
    # this host (see module docstring); dense build scales ~N^2, matvec ~N^2
    n_dev = jax.device_count()
    ref_3072_ms = 3 * 21_910.0 + 26 * 95.8
    ref_ms = float(os.environ.get(
        "BENCH_REF_STEP_MS", ref_3072_ms * (n_blobs / 3072.0) ** 2))
    print(json.dumps({
        "metric": f"brownian_step_ms_{SCHEME}_{n_blobs}blobs_{n_dev}chip",
        "value": round(elapsed_ms, 3),
        "unit": "ms/step",
        "vs_baseline": round(ref_ms / elapsed_ms, 1),
    }))


if __name__ == "__main__":
    main()
