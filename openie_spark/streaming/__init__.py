from openie_spark.streaming.ingest import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    stream_transcripts,
    stream_triples,
    windowed_triple_counts,
    windowed_turn_stats,
    write_triples_stream,
)
