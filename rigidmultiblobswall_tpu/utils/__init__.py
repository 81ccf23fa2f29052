from . import analysis, timer  # noqa: F401
