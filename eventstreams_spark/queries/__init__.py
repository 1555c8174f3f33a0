"""Query modules — importing this package populates registry.REGISTRY."""

from . import aggregations, core, joins, projections, windows  # noqa: F401
