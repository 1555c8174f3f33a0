"""Query modules — importing this package populates registry.REGISTRY."""

from . import aggregations, core, joins, llm, projections, scalars, windows  # noqa: F401
