from openie_spark.operators.sentences import segment_transcripts  # noqa: F401
from openie_spark.operators.extract import (  # noqa: F401
    tag_predicates,
    explode_extractions,
    assemble_triples,
    extract_triples,
)
