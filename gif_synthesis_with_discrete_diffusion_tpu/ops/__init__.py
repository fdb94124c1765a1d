from . import conv3d  # noqa: F401
