"""Knowledge-graph construction stages F-H (SURVEY.md §3.4, north_rule):

    triples → mentions → mention_vocab → candidate pairs
            → connected components → nodes / edges

These stages have no reference analogue (the reference stops at tuple
files); they are the north_rule's entity-linking + canonicalization +
graph-materialize composition, built Spark-first:

  * blocking + exact-Jaccard pairs: one shuffle on the block key,
    skew-capped blocks (head-entity guard), oracle-checkable in SQL.
  * minhash-LSH pairs: the scale path — band-bucket self-join instead
    of per-block quadratic compare; Jaccard-verified afterwards.
  * canonicalization: connected components by iterative min-label
    propagation to fixpoint (GraphFrames-style joins, no dependency).
  * graph materialize: entity-id bucketed nodes/edges tables.
"""
