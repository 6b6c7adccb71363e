from . import zoo  # noqa: F401
