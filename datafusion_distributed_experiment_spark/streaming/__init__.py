"""Structured Streaming operators.

The reference is strictly batch (``Boundedness::Bounded`` everywhere,
reference ``src/plan/arrow_flight_read.rs:37-38``) — streaming is part of
this engine's beyond-the-reference surface. The batch queries in
``queries/adhoc/events_daily.sql`` define the oracle semantics; the streaming
path must converge to the same answer on bounded input (tested with an
``availableNow`` trigger in tests/test_streaming.py).
"""

from .events import read_events_stream, windowed_counts

__all__ = ["read_events_stream", "windowed_counts"]
