"""openie_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the extraction/query semantics of AntNLP/OpenIE.

Pipeline (SURVEY.md §3.4):

    transcripts → sentences → tagged → spans → extractions → triples
               → mentions → entity linking → canonicalization → nodes/edges

Design rules (SURVEY.md §7):
  * DataFrame/SQL first — the rule-based extraction path is 100% JVM
    column expressions (higher-order array functions), no Python UDFs,
    no shuffles: scan → narrow transforms → write.
  * The neural tagger (BiLSTM+CRF, mirroring the reference architecture
    at /root/reference/modules/{encoder,bilstm,decoder}.py) is a
    swappable backend behind an Arrow-batched ``mapInPandas`` kernel.
  * Shuffles only where semantics demand them: entity-linking joins,
    connected components, graph materialize.
"""

__version__ = "0.1.0"

from openie_spark.session import get_spark  # noqa: F401
