"""Fluid velocity-field evaluation on a rectilinear grid.

Mirrors the reference plot path (/root/reference/plot/plot_velocity_field.py:18-121):
the field at grid nodes is the source-target mobility product of the blob
constraint forces with target radius `tracer_radius`, written to legacy VTK.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..io import vtk
from ..ops import mobility as mob
from . import kinematics as kin
from .system import State, System


def velocity_field_grid(grid_spec):
    """grid_spec: 9 floats (x0 x1 nx y0 y1 ny z0 z1 nz) in the reference's
    column layout (plot_velocity_field.py:22-38). Returns (coords (P,3),
    mesh axes (x, y, z), counts)."""
    grid = np.reshape(np.asarray(grid_spec, dtype=float), (3, 3)).T
    lengths = grid[1] - grid[0]
    counts = grid[2].astype(int)
    d = lengths / counts
    axes = [grid[0, k] + d[k] * (np.arange(counts[k]) + 0.5) for k in range(3)]
    zz, yy, xx = np.meshgrid(axes[2], axes[1], axes[0], indexing="ij")
    coords = np.stack([xx.ravel(), yy.ravel(), zz.ravel()], axis=1)
    mesh = [np.concatenate([axes[k] - 0.5 * d[k], [grid[1, k]]])
            for k in range(3)]
    return coords, mesh, counts


def evaluate_velocity_field(system: System, state: State, lam, grid_coords,
                            tracer_radius=0.0):
    """Velocity at grid_coords induced by blob forces lam (N,3)."""
    r_blobs = kin.blob_positions(system, state)
    radius_src = jnp.asarray(system.blob_radii, dtype=r_blobs.dtype)
    wall = system.domain in ("single_wall", "in_plane")
    return mob.source_target_matvec(
        r_blobs, jnp.asarray(grid_coords, dtype=r_blobs.dtype),
        jnp.asarray(lam).reshape(-1, 3), radius_src, tracer_radius,
        system.eta, wall=wall, periodic_length=system.periodic_length)


def plot_concentration_field_to_vtk(grid_spec, system: System, state: State,
                                    phoretic_cfg, output_name, *, c=None,
                                    suffix=""):
    """Evaluate the phoretic concentration field on the grid and write a
    scalar legacy-VTK file. Working replacement for the reference's
    undefined ``plot_concentration_field_pyVTK`` (multi_bodies/examples/
    Laplace_sphere/multi_bodies_stkfmm.py:219). ``c`` optionally reuses an
    already-solved surface concentration."""
    from . import phoretic as ph

    coords, mesh, _ = velocity_field_grid(grid_spec)
    c_grid, _ = ph.concentration_field(system, state, phoretic_cfg, coords,
                                       c=c)
    c_grid = np.asarray(c_grid)
    vtk.write_rectilinear_mesh(
        output_name + suffix + ".concentration_field.vtk",
        mesh[0], mesh[1], mesh[2],
        [("concentration", 1, c_grid.ravel())])
    return c_grid


def plot_velocity_field_to_vtk(grid_spec, system: System, state: State, lam,
                               output_name, tracer_radius=0.0):
    coords, mesh, _ = velocity_field_grid(grid_spec)
    vel = np.asarray(evaluate_velocity_field(system, state, lam, coords,
                                             tracer_radius=tracer_radius))
    vtk.write_rectilinear_mesh(
        output_name + ".velocity_field.vtk", mesh[0], mesh[1], mesh[2],
        [("velocity", 3, vel.ravel())])
    return vel
