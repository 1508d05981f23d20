"""Numpy forward pass + CRF Viterbi decode (batched).

Faithful numpy re-expression of the reference modules:
  * encode: emb(x) + seg_emb(seg) → LayerNorm → BiLSTM → linear
    (/root/reference/modules/encoder.py:34-40, modules/bilstm.py:19-23)
  * decode: CRF Viterbi, torchcrf semantics — start/transition/end
    scores + emissions, masked by true length
    (/root/reference/modules/decoder.py:15-17; the algorithm is the
    textbook one also hand-rolled at /root/reference/modules/crf.py:32-65)

Everything is vectorized over the batch dimension; the only Python loop
is over time steps (T ≤ a few hundred pieces).
"""

from __future__ import annotations

import numpy as np

from openie_spark.model.weights import H, NTAGS, NUM_LAYERS, TaggerWeights


def _layer_norm(x: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _sigmoid_(x: np.ndarray) -> np.ndarray:
    """In-place sigmoid: same op sequence as 1/(1+exp(-x))."""
    np.negative(x, out=x)
    np.exp(x, out=x)
    x += 1.0
    np.reciprocal(x, out=x)
    return x


def _lstm_dir(x: np.ndarray, wx: np.ndarray, wh: np.ndarray, b: np.ndarray,
              lengths: np.ndarray, reverse: bool) -> np.ndarray:
    """One direction of one LSTM layer. x: (B, T, Din) → (B, T, H).

    The step loop runs T times per layer/direction on small (B, H)
    arrays, so temporaries are preallocated and every op runs in-place
    (``out=``): fresh per-step allocations measurably dominated the
    loop's cost, especially in freshly forked workers whose heaps have
    no warm arena. Bit-identical to the allocate-per-step formulation
    (same IEEE op sequence), pinned by the viterbi_brute tests.
    """
    B, T, _ = x.shape
    out = np.zeros((B, T, H), dtype=np.float32)
    h = np.zeros((B, H), dtype=np.float32)
    c = np.zeros((B, H), dtype=np.float32)
    # precompute input projections as one flat GEMM — einsum's btd,dk
    # path runs ~10x slower than BLAS here (measured on this build)
    xp = (x.reshape(B * T, -1) @ wx).reshape(B, T, -1) + b
    gates = np.empty((B, 4 * H), dtype=np.float32)
    hw = np.empty((B, 4 * H), dtype=np.float32)
    c_new = np.empty((B, H), dtype=np.float32)
    h_new = np.empty((B, H), dtype=np.float32)
    tmp = np.empty((B, H), dtype=np.float32)
    alive_all = np.arange(T)[None, :] < lengths[:, None]   # (B, T)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        np.dot(h, wh, out=hw)
        np.add(xp[:, t, :], hw, out=gates)
        i = _sigmoid_(gates[:, :H])
        f = _sigmoid_(gates[:, H:2 * H])
        g = np.tanh(gates[:, 2 * H:3 * H], out=gates[:, 2 * H:3 * H])
        o = _sigmoid_(gates[:, 3 * H:])
        np.multiply(f, c, out=c_new)
        np.multiply(i, g, out=tmp)
        c_new += tmp
        np.tanh(c_new, out=tmp)
        np.multiply(o, tmp, out=h_new)
        # positions past a sequence's true length keep state frozen at 0
        # (reverse pass) / last (forward pass is equivalent since padded
        # outputs are masked downstream anyway)
        alive = alive_all[:, t][:, None]
        np.copyto(c, c_new, where=alive)
        np.copyto(h, h_new, where=alive)
        ot = out[:, t, :]
        np.copyto(ot, h)
        ot[~alive_all[:, t]] = 0.0
    return out


def emissions(w: TaggerWeights, ids: np.ndarray, seg: np.ndarray,
              lengths: np.ndarray) -> np.ndarray:
    """(B, T) ids + seg → (B, T, NTAGS) emission scores."""
    x = w.embedding[ids] + w.seg_emb[seg]
    x = _layer_norm(x)
    for li in range(NUM_LAYERS):
        lay = w.layers[li]
        fw = _lstm_dir(x, lay.wx_f, lay.wh_f, lay.b_f, lengths, reverse=False)
        bw = _lstm_dir(x, lay.wx_b, lay.wh_b, lay.b_b, lengths, reverse=True)
        x = np.concatenate([fw, bw], axis=-1)
    return x @ w.emit_w + w.emit_b


def viterbi(w: TaggerWeights, emis: np.ndarray, lengths: np.ndarray) -> list[np.ndarray]:
    """Batched CRF Viterbi. Returns per-sequence best tag-id paths
    (length = true length), torchcrf.CRF.decode semantics."""
    B, T, K = emis.shape
    assert K == NTAGS
    score = w.crf_start[None, :] + emis[:, 0, :]          # (B, K)
    history = np.zeros((T, B, K), dtype=np.int32)
    trans = w.crf_trans[None, :, :]                        # (1, K, K)
    for t in range(1, T):
        # broadcast: score[b, prev] + trans[prev, next]
        cand = score[:, :, None] + trans                   # (B, K, K)
        best_prev = cand.argmax(axis=1)                    # (B, K)
        best_score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
        new_score = best_score + emis[:, t, :]
        alive = (t < lengths)[:, None]
        score = np.where(alive, new_score, score)
        history[t] = np.where(alive, best_prev, np.arange(K)[None, :])
    final = score + w.crf_end[None, :]
    last = final.argmax(axis=1).astype(np.int32)           # (B,)
    # Vectorized backtrack (T steps instead of B*T python iterations):
    # for t >= a sequence's true length, history[t] was written as the
    # identity permutation, so walking a finished row through it leaves
    # its tag unchanged — by the time t reaches L-1 the carried value
    # is still `last`, exactly the per-sequence seed path[L-1] = last.
    paths_mat = np.empty((B, T), dtype=np.int32)
    paths_mat[:, T - 1] = last
    rows = np.arange(B)
    cur = last
    for t in range(T - 1, 0, -1):
        cur = history[t, rows, cur]
        paths_mat[:, t - 1] = cur
    return [paths_mat[b, : int(lengths[b])] for b in range(B)]


def viterbi_brute(w: TaggerWeights, emis_1: np.ndarray) -> np.ndarray:
    """Exhaustive-search oracle for tests (single sequence, tiny T)."""
    import itertools

    T = emis_1.shape[0]
    best, best_s = None, -np.inf
    for path in itertools.product(range(NTAGS), repeat=T):
        s = w.crf_start[path[0]] + emis_1[0, path[0]]
        for t in range(1, T):
            s += w.crf_trans[path[t - 1], path[t]] + emis_1[t, path[t]]
        s += w.crf_end[path[-1]]
        if s > best_s:
            best, best_s = path, s
    return np.array(best, dtype=np.int32)
