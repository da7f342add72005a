"""Structured Streaming surface.

The reference engine has **no** streaming path (SURVEY.md §2.12 — category
absent), so everything here is beyond-reference: the streaming twins of the
batch event-analytics queries, built on ``readStream`` → watermarked
windowed aggregation → ``writeStream``, plus an
``applyInPandasWithState`` custom stateful operator.
"""

from dblink_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    sessionize_stream,
    user_running_stats,
    windowed_event_counts,
)
