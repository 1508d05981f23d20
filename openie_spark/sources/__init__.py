from openie_spark.sources.transcripts import (  # noqa: F401
    derive_transcripts,
    read_transcripts,
    TRANSCRIPTS_CTE_DUCKDB,
)
