"""Query modules — importing this package populates registry.REGISTRY."""

from . import aggregations, core, joins, llm, projections, scalars, textqa, windows  # noqa: F401
