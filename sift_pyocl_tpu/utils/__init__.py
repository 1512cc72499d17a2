from . import testimage  # noqa: F401
