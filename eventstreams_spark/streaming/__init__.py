"""Structured Streaming surface (SURVEY §2.9 T-series).

Batch and streaming share the same plan builders (the M2 pipeline layer
applies unchanged); this package adds the streaming-only semantics:
event-time windows + watermarks, streaming dedup, stateful per-key
operators, and replay utilities that let batch oracles validate
streaming operators via trigger(availableNow=True) (SURVEY §3.3/§5.3).
"""

from .windows import session_agg, sliding_agg, tumbling_agg  # noqa: F401
from .dedup import stream_dedup  # noqa: F401
from .replay import replay_table  # noqa: F401
