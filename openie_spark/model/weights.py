"""Deterministic seeded model weights.

Two taggers (predicate / argument), same architecture, different seeds —
the reference's joint composition holds two ``Pipeline`` submodels the
same way (/root/reference/models/seqie.py:43-56).

Shapes (tiny on purpose — inference throughput is the point, the tag
quality contract is determinism, not linguistics):

    embedding   : (VOCAB_BUCKETS, D)       hash-bucket wordpiece embedding
    seg_emb     : (3, D)                   SEG_NUM=3 (/root/reference/configs/joint.cfg:62)
    lstm fw/bw  : W_x (4H, D), W_h (4H, H), b (4H,)   x NUM_LAYERS
    emit        : W (2H, NTAGS), b (NTAGS,)
    crf         : start (NTAGS,), end (NTAGS,), trans (NTAGS, NTAGS)
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np

from openie_spark.config import TAGSET_OIE2016

VOCAB_BUCKETS = 4096
D = 32
H = 32
NUM_LAYERS = 2  # /root/reference/configs/joint.cfg LSTM layers
NTAGS = len(TAGSET_OIE2016)
SEG_NUM = 3


@dataclass(frozen=True)
class LstmLayer:
    wx_f: np.ndarray
    wh_f: np.ndarray
    b_f: np.ndarray
    wx_b: np.ndarray
    wh_b: np.ndarray
    b_b: np.ndarray


@dataclass(frozen=True)
class TaggerWeights:
    embedding: np.ndarray
    seg_emb: np.ndarray
    layers: tuple
    emit_w: np.ndarray
    emit_b: np.ndarray
    crf_start: np.ndarray
    crf_end: np.ndarray
    crf_trans: np.ndarray
    version: str = field(default="", compare=False)


def _glorot(rng: np.random.Generator, *shape: int) -> np.ndarray:
    scale = np.sqrt(6.0 / sum(shape[-2:])) if len(shape) >= 2 else 0.1
    return rng.uniform(-scale, scale, size=shape).astype(np.float32)


# Emission-bias prior: special tags ([PAD]/[CLS]/[SEP]) must never win
# Viterbi on a real word position (the reference's CRF learns this from
# supervision; our seeded stand-in encodes it as a calibrated prior).
_SPECIAL_PENALTY = -8.0
_N_SPECIAL = 3


def _calibrate(w: "TaggerWeights", rng: np.random.Generator) -> np.ndarray:
    """Zero-center per-tag emissions over a deterministic probe batch so
    decoded tag paths are emission-driven (diverse) rather than
    collapsing to one transition-favored tag."""
    from openie_spark.model.kernel import emissions
    from openie_spark.model.tokenizer import encode_batch

    probe_words = [[f"w{rng.integers(0, 1 << 30)}" for _ in range(24)] for _ in range(8)]
    ids, seg, _, lengths, _ = encode_batch(probe_words)
    emis = emissions(w, ids, seg, lengths)
    bias = -emis.mean(axis=(0, 1)).astype(np.float32)
    bias[:_N_SPECIAL] += _SPECIAL_PENALTY
    return bias


def build_tagger(seed: int) -> TaggerWeights:
    rng = np.random.default_rng(seed)
    layers = []
    for li in range(NUM_LAYERS):
        d_in = D if li == 0 else 2 * H
        layers.append(LstmLayer(
            wx_f=_glorot(rng, d_in, 4 * H), wh_f=_glorot(rng, H, 4 * H),
            b_f=np.zeros(4 * H, dtype=np.float32),
            wx_b=_glorot(rng, d_in, 4 * H), wh_b=_glorot(rng, H, 4 * H),
            b_b=np.zeros(4 * H, dtype=np.float32),
        ))
    w = TaggerWeights(
        embedding=_glorot(rng, VOCAB_BUCKETS, D),
        seg_emb=_glorot(rng, SEG_NUM, D),
        layers=tuple(layers),
        # 4x emission gain: decode should be driven by per-token
        # evidence, with transitions as a tie-breaker (the trained
        # reference CRF has the same property on confident tokens)
        emit_w=_glorot(rng, 2 * H, NTAGS) * 4.0,
        emit_b=np.zeros(NTAGS, dtype=np.float32),
        crf_start=rng.uniform(-0.1, 0.1, NTAGS).astype(np.float32),
        crf_end=rng.uniform(-0.1, 0.1, NTAGS).astype(np.float32),
        crf_trans=rng.uniform(-0.1, 0.1, (NTAGS, NTAGS)).astype(np.float32),
    )
    w.emit_b[:] = _calibrate(w, rng)
    h = hashlib.sha256()
    for arr in (w.embedding, w.seg_emb, w.emit_w, w.emit_b, w.crf_trans):
        h.update(arr.tobytes())
    object.__setattr__(w, "version", f"seqie-np-{seed}-{h.hexdigest()[:12]}")
    return w


PRED_SEED = 1016  # stage-1 (predicate) tagger
ARG_SEED = 2016   # stage-2 (argument) tagger


_CACHE: dict[tuple[int, float], TaggerWeights] = {}


def _perturb_eps() -> float:
    """Test-only fault-injection hook: OPENIE_WEIGHTS_PERTURB=<eps>
    scales the emission weights by (1+eps) so the content-golden tests
    can prove they detect kernel drift end to end THROUGH the executor
    python workers (set via sc.environment, which feeds the env of
    subsequently created UDF workers). Unset/0 in production."""
    import os

    return float(os.environ.get("OPENIE_WEIGHTS_PERTURB", "0") or 0.0)


def get_tagger(seed: int) -> TaggerWeights:
    """Per-process singleton — loaded once per executor worker, reused
    across all Arrow batches (the Spark analogue of the reference's
    once-per-process model load, /root/reference/run.py:519-524)."""
    eps = _perturb_eps()
    key = (seed, eps)
    w = _CACHE.get(key)
    if w is None:
        w = build_tagger(seed)
        if eps:
            pert = TaggerWeights(
                embedding=w.embedding, seg_emb=w.seg_emb, layers=w.layers,
                emit_w=w.emit_w * (1.0 + eps), emit_b=w.emit_b,
                crf_start=w.crf_start, crf_end=w.crf_end,
                crf_trans=w.crf_trans, version=w.version + f"+p{eps}",
            )
            w = pert
        _CACHE[key] = w
    return w
