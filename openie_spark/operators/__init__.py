from openie_spark.operators.sentences import segment_transcripts  # noqa: F401
from openie_spark.operators.extract import (  # noqa: F401
    tag_predicates,
    fan_out_spans,
    explode_extractions,
    assemble_triples,
    assemble_triples_fast,
    extract_triples,
)
