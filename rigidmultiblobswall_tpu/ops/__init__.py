from . import (  # noqa: F401
    forces,
    gmres,
    lanczos,
    laplace,
    mobility,
    mobility_sfm,
    quaternion,
    rpy,
    stokes_layers,
)

