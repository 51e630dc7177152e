from . import association, phd  # noqa: F401
