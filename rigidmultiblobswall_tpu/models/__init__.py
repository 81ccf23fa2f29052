from . import system, kinematics, saddle, solvers, integrators  # noqa: F401
