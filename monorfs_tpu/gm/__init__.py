from . import gaussian, mixture  # noqa: F401
from .mixture import GM  # noqa: F401
