from petastorm_spark.streaming.feed import (  # noqa: F401
    sessionize_stream,
    stream_dataset,
    windowed_event_counts,
)
