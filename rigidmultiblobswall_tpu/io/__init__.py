from . import input_file, scene  # noqa: F401
