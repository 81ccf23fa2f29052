"""Accelerator f32 kernel accuracy vs the f64 CPU oracle (VERDICT r1 #6).

Runs accuracy.py in a subprocess WITHOUT the CPU pin the rest of the
suite uses, so on a TPU host it exercises the real f32 TPU fast path
(including the direct-block Pallas kernels) against f64.  Skipped when
no accelerator is attached — then the comparison would be f32-CPU vs
f64-CPU, which tests/test_mobility.py already covers at 1e-12.
"""

import json
import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _has_accelerator():
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=120,
        env={k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"})
    return probe.returncode == 0 and probe.stdout.strip() not in ("cpu", "")


def test_accelerator_f32_matches_f64_oracle():
    if not _has_accelerator():
        pytest.skip("no accelerator attached")
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["ACCURACY_BLOBS"] = "1536"
    env["ACCURACY_SPECTRAL_BLOBS"] = "1024"
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "accuracy.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["backend"] != "cpu"
    for coupling, err in result["rel_err"].items():
        if coupling == "spectral":
            # f32 noise must stay below the engine's own Ewald
            # truncation tolerance (1e-4); measured ~8e-6
            assert err < 5e-5, (coupling, err)
        else:
            # f32 eps is 1.2e-7; the pair sweep stays within ~100 eps
            assert err < 2e-5, (coupling, err)
