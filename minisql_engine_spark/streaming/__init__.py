from minisql_engine_spark.streaming.windows import (
    tumbling_event_agg,
    sliding_event_agg,
    session_event_agg,
    read_events_stream,
)

__all__ = [
    "tumbling_event_agg",
    "sliding_event_agg",
    "session_event_agg",
    "read_events_stream",
]
from minisql_engine_spark.streaming.windows import stateful_user_stats  # noqa: E402,F401

__all__.append("stateful_user_stats")
from minisql_engine_spark.streaming.windows import stream_dedup_events  # noqa: E402,F401

__all__.append("stream_dedup_events")
from minisql_engine_spark.streaming.joins import (  # noqa: E402,F401
    attribution_join,
    attribution_join_events,
)

__all__ += ["attribution_join", "attribution_join_events"]
from minisql_engine_spark.streaming.curate import (  # noqa: E402,F401
    curate_stream,
    read_documents_stream,
)

__all__ += ["curate_stream", "read_documents_stream"]
from minisql_engine_spark.streaming.ingest import (  # noqa: E402,F401
    stream_admit,
    stream_admit_neardup,
    stream_admit_snapshot,
    stream_agg_view,
)

__all__ += [
    "stream_admit",
    "stream_admit_neardup",
    "stream_admit_snapshot",
    "stream_agg_view",
]
