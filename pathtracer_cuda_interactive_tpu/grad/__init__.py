from . import inverse  # noqa: F401
