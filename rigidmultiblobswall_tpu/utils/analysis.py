"""Trajectory analysis: MSD (direct and FFT), rotational MSD, trajectory
text I/O, mobility origin transfer.

Functional counterparts of the reference analysis utilities
(/root/reference/general_application_utils.py:230-485).
"""

from __future__ import annotations

import os

import numpy as np


def msd_direct(x, max_lag=None):
    """Scalar/vector MSD by direct lag averaging: x (T,) or (T, d).
    Returns (max_lag,) array with msd[tau] = <|x(t+tau)-x(t)|^2>."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    T = x.shape[0]
    max_lag = max_lag or T // 2
    out = np.zeros(max_lag)
    for tau in range(1, max_lag):
        d = x[tau:] - x[:-tau]
        out[tau] = np.mean(np.sum(d * d, axis=1))
    return out


def msd_fft(x, max_lag=None):
    """FFT-based MSD, O(T log T) (the reference's fft_msd idea,
    general_application_utils.py:305-336, using the standard
    Kneller/Calandrini algorithm). x (T,) or (T, d)."""
    x = np.asarray(x, dtype=float)
    if x.ndim == 1:
        x = x[:, None]
    T = x.shape[0]
    max_lag = max_lag or T // 2

    # S2 via autocorrelation with zero padding
    n_fft = 1 << (2 * T - 1).bit_length()
    S2 = np.zeros(T)
    for dim in range(x.shape[1]):
        f = np.fft.rfft(x[:, dim], n_fft)
        acf = np.fft.irfft(f * np.conjugate(f), n_fft)[:T].real
        S2 += acf
    S2 /= np.arange(T, 0, -1)

    D = np.append(np.sum(x * x, axis=1), 0.0)
    Q = 2.0 * np.sum(D)
    S1 = np.zeros(T)
    for m in range(T):
        Q -= D[m - 1] + D[T - m]
        S1[m] = Q / (T - m)
    return (S1 - 2 * S2)[:max_lag]


def rotational_msd(locations, quaternions, max_lag=None):
    """6x6 translation-rotation MSD matrix per lag
    (general_application_utils.py:230-303 semantics): the rotational
    displacement of a lag is sum_i u_i x u_i' / 2 over the three rotated
    axes. Returns (max_lag, 6, 6)."""
    from ..ops import quaternion as quat
    import jax.numpy as jnp

    locations = np.asarray(locations)
    R = np.asarray(quat.rotation_matrix(jnp.asarray(quaternions)))
    T = locations.shape[0]
    max_lag = max_lag or T // 2
    out = np.zeros((max_lag, 6, 6))
    for tau in range(1, max_lag):
        dx = locations[tau:] - locations[:-tau]
        # rotation displacement: 1/2 sum_i u_i(t) x u_i(t+tau)
        u0 = R[:-tau]  # (n,3,3), axes are columns
        u1 = R[tau:]
        drot = 0.5 * np.sum(np.cross(u0.transpose(0, 2, 1),
                                     u1.transpose(0, 2, 1), axis=2), axis=1)
        d6 = np.concatenate([dx, drot], axis=1)
        out[tau] = np.einsum("ni,nj->ij", d6, d6) / d6.shape[0]
    return out


def write_trajectory_to_txt(file_name, trajectory, params, location=True):
    """Reference-format trajectory file
    (general_application_utils.py:338-366)."""
    dir_name = os.path.dirname(file_name)
    if dir_name and not os.path.isdir(dir_name):
        os.makedirs(dir_name, exist_ok=True)
    with open(file_name, "w") as f:
        f.write("Parameters:\n")
        for key, value in params.items():
            f.write("%s: %s \n" % (key, value))
        f.write("Trajectory data:\n")
        if location:
            f.write("Location, Orientation:\n")
            for x, theta in zip(trajectory[0], trajectory[1]):
                f.write("%s, %s, %s, %s, %s, %s, %s \n" % (
                    x[0], x[1], x[2], theta[0], theta[1], theta[2], theta[3]))
        else:
            f.write("Orientation:\n")
            for theta in trajectory[0]:
                f.write("%s, %s, %s, %s \n" % tuple(theta))


def read_trajectory_from_txt(file_name, location=True):
    """Read the reference trajectory format; returns (params, locations,
    orientations) (general_application_utils.py:368-415)."""
    params = {}
    locations = []
    orientations = []
    with open(file_name, "r") as f:
        f.readline()  # 'Parameters:'
        line = f.readline()
        while line and line != "Trajectory data:\n":
            key, _, value = line.partition(":")
            params[key.strip()] = value.strip()
            line = f.readline()
        f.readline()  # header line
        for line in f:
            parts = [p for p in line.replace(",", " ").split() if p]
            if not parts:
                continue
            vals = [float(p) for p in parts]
            if location:
                locations.append(vals[0:3])
                orientations.append(vals[3:7])
            else:
                orientations.append(vals[0:4])
    return params, np.array(locations), np.array(orientations)


def _tensor_cross_vector(T, v):
    out = np.zeros((3, 3))
    for k in range(3):
        for l in range(3):
            out[k, l] = (T[k, (l + 1) % 3] * v[(l - 1) % 3]
                         - T[k, (l - 1) % 3] * v[(l + 1) % 3])
    return out


def _vector_cross_tensor(v, T):
    out = np.zeros((3, 3))
    for k in range(3):
        for l in range(3):
            out[k, l] = (T[(k - 1) % 3, l] * v[(k + 1) % 3]
                         - T[(k + 1) % 3, l] * v[(k - 1) % 3])
    return out


def transfer_mobility(mobility_1, point_1, point_2):
    """Move a 6x6 body mobility between evaluation points (Bernal &
    De La Torre formulas; general_application_utils.py:417-455)."""
    r = np.asarray(point_1, dtype=float) - np.asarray(point_2, dtype=float)
    m1 = np.asarray(mobility_1)
    m2 = np.zeros((6, 6))
    m2[3:6, 3:6] = m1[3:6, 3:6]
    m2[3:6, 0:3] = m1[3:6, 0:3] + _tensor_cross_vector(m1[3:6, 3:6], r)
    m2[0:3, 3:6] = m2[3:6, 0:3].T
    m2[0:3, 0:3] = (m1[0:3, 0:3]
                    + _tensor_cross_vector(m1[0:3, 3:6], r)
                    - _vector_cross_tensor(r, m1[3:6, 0:3])
                    - _vector_cross_tensor(
                        r, _tensor_cross_vector(m1[3:6, 3:6], r)))
    return m2
