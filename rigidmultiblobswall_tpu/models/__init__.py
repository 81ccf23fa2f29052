from . import (  # noqa: F401
    articulated,
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

