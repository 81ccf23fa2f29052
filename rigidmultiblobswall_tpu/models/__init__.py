from . import (  # noqa: F401
    articulated,
    fibers,
    fields,
    integrators,
    kinematics,
    lubrication,
    mcmc,
    phoretic,
    rollers,
    saddle,
    solvers,
    system,
)

