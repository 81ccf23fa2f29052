from . import quaternion, rpy, mobility  # noqa: F401
