"""CaRB evaluation engine (SURVEY.md §2.4, E1-E6) — the correctness
oracle for extraction parity, re-expressed as a Spark cogroup.

The per-sentence score matrix + greedy matching is a faithful port of
the vendored CaRB benchmark's default path
(/root/reference/eval/evaluation.py:36 pins binary_linient_tuple_match);
the gold↔predicted sentence association is a hash equi-join on the
normalized sentence key, and the global P/R/F1 reduction is a plain
Catalyst aggregate — the two places the single-process reference would
not scale.
"""
