from . import combinatorics  # noqa: F401
