"""Neural tagging backend — a from-scratch numpy re-expression of the
reference's SeqIE architecture (BERT-ish hash-embedding encoder + segment
embedding + BiLSTM + linear emission + CRF Viterbi), run as Arrow-batched
``mapInPandas`` kernels.

torch/transformers are not in this sandbox, so the token encoder is a
deterministic seeded hash-embedding stand-in with the same *interface*
(per-wordpiece vectors + segment channel) as the reference encoder
(/root/reference/modules/encoder.py:7-40); BiLSTM, emission head, and CRF
decode are faithful numpy implementations of
/root/reference/modules/bilstm.py:5-23, /root/reference/modules/decoder.py:5-17.
Weights are an input artifact (seeded, content-hashed into the lineage
manifests); the reference ships no trained checkpoint either (SURVEY.md §5).
"""
