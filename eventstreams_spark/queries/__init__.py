"""Query modules — importing this package populates registry.REGISTRY."""

from . import core  # noqa: F401
