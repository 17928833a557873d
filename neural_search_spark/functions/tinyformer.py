"""Tiny numpy transformer encoder — the in-repo, executable twin of
``models.sentence_transformer_loader`` (which needs torch that this
container lacks).

This is a REAL transformer architecture, not hash algebra: learned
token + positional embeddings, pre-LN multi-head self-attention,
GELU feed-forward blocks, a final layernorm, masked mean pooling and
L2 normalization — the exact computation graph of a 2-layer MiniLM /
sentence-transformers bi-encoder, in plain numpy. The reference's
model layer is a live RPC client (`ml/MLCommonsClientAccessor.java:
110-175` inferenceSentences); here the encoder runs INSIDE the Spark
job as an Arrow-batched pandas UDF via the same model registry every
other checkpoint uses (models.transformer_checkpoint_loader).

QUERY/PASSAGE asymmetry is the e5-style prefix-token contract — the
same thing ``sentence_transformer_loader`` does with the "query: " /
"passage: " string prefixes, here as reserved vocab ids [QRY]/[PSG]
(`ml/AsymmetricModelDetector.java` is the reference's analogue).

Training (scripts/train_transformer.py) distills the encoder to the
in-repo LSA teacher with hand-written analytic backprop + Adam; the
backward pass below is verified against finite differences for every
parameter by tests/test_tinyformer.py::test_gradient_check.

Everything is float64 and deterministic — golden vectors pin the
forward pass across processes.
"""

from __future__ import annotations

import numpy as np

PAD, UNK, QRY, PSG = 0, 1, 2, 3
SPECIALS = ["[PAD]", "[UNK]", "[QRY]", "[PSG]"]

_G = np.sqrt(2.0 / np.pi)  # tanh-approximation GELU constant


def gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(_G * (x + 0.044715 * x**3)))


def gelu_grad(x: np.ndarray) -> np.ndarray:
    t = np.tanh(_G * (x + 0.044715 * x**3))
    dt = (1.0 - t**2) * _G * (1.0 + 3 * 0.044715 * x**2)
    return 0.5 * (1.0 + t) + 0.5 * x * dt


def init_params(
    vocab_size: int,
    dim: int = 32,
    n_layers: int = 2,
    n_heads: int = 2,
    ffn_dim: int = 64,
    max_len: int = 48,
    seed: int = 7,
) -> dict[str, np.ndarray]:
    """Xavier-ish init. Params are a flat dict so the whole model is
    one npz checkpoint (np.savez) — the load-once-per-worker lifecycle
    is identical to a torch state_dict mmap."""
    rng = np.random.default_rng(seed)

    def mat(*shape):
        return rng.normal(0.0, 1.0 / np.sqrt(shape[0]), shape)

    p: dict[str, np.ndarray] = {
        "E": rng.normal(0.0, 0.5, (vocab_size, dim)),
        "P": rng.normal(0.0, 0.1, (max_len, dim)),
        "lnf_g": np.ones(dim),
        "lnf_b": np.zeros(dim),
    }
    for l in range(n_layers):
        p[f"l{l}_Wq"] = mat(dim, dim)
        p[f"l{l}_Wk"] = mat(dim, dim)
        p[f"l{l}_Wv"] = mat(dim, dim)
        p[f"l{l}_Wo"] = mat(dim, dim)
        p[f"l{l}_ln1_g"] = np.ones(dim)
        p[f"l{l}_ln1_b"] = np.zeros(dim)
        p[f"l{l}_W1"] = mat(dim, ffn_dim)
        p[f"l{l}_b1"] = np.zeros(ffn_dim)
        p[f"l{l}_W2"] = mat(ffn_dim, dim)
        p[f"l{l}_b2"] = np.zeros(dim)
        p[f"l{l}_ln2_g"] = np.ones(dim)
        p[f"l{l}_ln2_b"] = np.zeros(dim)
    p["_meta"] = np.array([n_layers, n_heads, max_len], dtype=np.int64)
    return p


def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray, eps: float = 1e-6):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc**2).mean(-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    xn = xc * inv
    return xn * g + b, (xn, inv)


def _ln_backward(dy, cache, g):
    xn, inv = cache
    d = xn.shape[-1]
    dg = (dy * xn).sum(axis=tuple(range(dy.ndim - 1)))
    db = dy.sum(axis=tuple(range(dy.ndim - 1)))
    dxn = dy * g
    dx = inv * (
        dxn
        - dxn.mean(-1, keepdims=True)
        - xn * (dxn * xn).mean(-1, keepdims=True)
    )
    return dx, dg, db


def forward(
    params: dict[str, np.ndarray],
    ids: np.ndarray,
    mask: np.ndarray,
    cache: list | None = None,
) -> np.ndarray:
    """Batched forward: ids (B, L) int, mask (B, L) {0,1} float.
    Returns L2-normalized (B, dim) sentence embeddings. When ``cache``
    is a list, every intermediate needed by backward() is appended."""
    n_layers, n_heads, _ = (int(v) for v in params["_meta"])
    B, L = ids.shape
    d = params["E"].shape[1]
    hd = d // n_heads
    x = params["E"][ids] + params["P"][:L]
    m = mask[:, :, None]
    # additive attention mask: pad keys get -inf scores
    neg = np.where(mask[:, None, :] > 0, 0.0, -1e9)  # (B, 1, Lk)
    if cache is not None:
        cache.append(("embed", ids, mask))
    for l in range(n_layers):
        h1, ln1c = _ln(x, params[f"l{l}_ln1_g"], params[f"l{l}_ln1_b"])
        q = h1 @ params[f"l{l}_Wq"]
        k = h1 @ params[f"l{l}_Wk"]
        v = h1 @ params[f"l{l}_Wv"]
        # (B, H, L, hd)
        qh = q.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, n_heads, hd).transpose(0, 2, 1, 3)
        scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
        scores = scores + neg[:, None, :, :]
        scores -= scores.max(-1, keepdims=True)
        e = np.exp(scores)
        a = e / e.sum(-1, keepdims=True)  # (B, H, Lq, Lk)
        ctx = (a @ vh).transpose(0, 2, 1, 3).reshape(B, L, d)
        attn_out = ctx @ params[f"l{l}_Wo"]
        x1 = x + attn_out
        h2, ln2c = _ln(x1, params[f"l{l}_ln2_g"], params[f"l{l}_ln2_b"])
        z = h2 @ params[f"l{l}_W1"] + params[f"l{l}_b1"]
        f = gelu(z) @ params[f"l{l}_W2"] + params[f"l{l}_b2"]
        if cache is not None:
            cache.append(
                ("layer", l, x, h1, ln1c, qh, kh, vh, a, ctx, x1, h2, ln2c, z)
            )
        x = x1 + f
    hF, lnfc = _ln(x, params["lnf_g"], params["lnf_b"])
    cnt = np.maximum(m.sum(1), 1.0)  # (B, 1)
    pooled = (hF * m).sum(1) / cnt
    nrm = np.linalg.norm(pooled, axis=1, keepdims=True)
    nrm = np.where(nrm == 0.0, 1.0, nrm)
    out = pooled / nrm
    if cache is not None:
        cache.append(("final", x, hF, lnfc, cnt, pooled, nrm, out))
    return out


def backward(
    params: dict[str, np.ndarray],
    cache: list,
    dout: np.ndarray,
) -> dict[str, np.ndarray]:
    """Analytic gradients for every parameter, given dL/d(out).
    Verified against finite differences (tests/test_tinyformer.py)."""
    n_layers, n_heads, _ = (int(v) for v in params["_meta"])
    grads = {k: np.zeros_like(v) for k, v in params.items() if k != "_meta"}
    tag, x_last, hF, lnfc, cnt, pooled, nrm, out = cache[-1]
    assert tag == "final"
    # L2 normalize backward: d(pooled) = (I - out out^T)/nrm @ dout
    dpooled = (dout - out * (dout * out).sum(1, keepdims=True)) / nrm
    layer_caches = [c for c in cache if c[0] == "layer"]
    _, ids, mask = cache[0]
    m = mask[:, :, None]
    B, L = ids.shape
    d = params["E"].shape[1]
    hd = d // n_heads
    dhF = (dpooled[:, None, :] / cnt[:, None, :]) * m
    dx, dg, db = _ln_backward(dhF, lnfc, params["lnf_g"])
    grads["lnf_g"] += dg
    grads["lnf_b"] += db
    for l in range(n_layers - 1, -1, -1):
        (_, _, x0, h1, ln1c, qh, kh, vh, a, ctx, x1, h2, ln2c, z) = layer_caches[l]
        # x_out = x1 + f ; f = gelu(z) @ W2 + b2 ; z = h2 @ W1 + b1
        df = dx
        gz = gelu(z)
        grads[f"l{l}_W2"] += gz.reshape(-1, gz.shape[-1]).T @ df.reshape(-1, d)
        grads[f"l{l}_b2"] += df.sum((0, 1))
        dgz = df @ params[f"l{l}_W2"].T
        dz = dgz * gelu_grad(z)
        grads[f"l{l}_W1"] += h2.reshape(-1, d).T @ dz.reshape(-1, dz.shape[-1])
        grads[f"l{l}_b1"] += dz.sum((0, 1))
        dh2 = dz @ params[f"l{l}_W1"].T
        dx1_ln, dg2, db2 = _ln_backward(dh2, ln2c, params[f"l{l}_ln2_g"])
        grads[f"l{l}_ln2_g"] += dg2
        grads[f"l{l}_ln2_b"] += db2
        dx1 = dx + dx1_ln
        # x1 = x0 + ctx @ Wo
        dattn = dx1
        grads[f"l{l}_Wo"] += ctx.reshape(-1, d).T @ dattn.reshape(-1, d)
        dctx = (dattn @ params[f"l{l}_Wo"].T).reshape(B, L, n_heads, hd)
        dctx = dctx.transpose(0, 2, 1, 3)  # (B, H, L, hd)
        da = dctx @ vh.transpose(0, 1, 3, 2)
        dvh = a.transpose(0, 1, 3, 2) @ dctx
        # softmax backward
        ds = a * (da - (da * a).sum(-1, keepdims=True))
        ds = ds / np.sqrt(hd)
        dqh = ds @ kh
        dkh = ds.transpose(0, 1, 3, 2) @ qh
        dq = dqh.transpose(0, 2, 1, 3).reshape(B, L, d)
        dk = dkh.transpose(0, 2, 1, 3).reshape(B, L, d)
        dv = dvh.transpose(0, 2, 1, 3).reshape(B, L, d)
        grads[f"l{l}_Wq"] += h1.reshape(-1, d).T @ dq.reshape(-1, d)
        grads[f"l{l}_Wk"] += h1.reshape(-1, d).T @ dk.reshape(-1, d)
        grads[f"l{l}_Wv"] += h1.reshape(-1, d).T @ dv.reshape(-1, d)
        dh1 = (
            dq @ params[f"l{l}_Wq"].T
            + dk @ params[f"l{l}_Wk"].T
            + dv @ params[f"l{l}_Wv"].T
        )
        dx0_ln, dg1, db1 = _ln_backward(dh1, ln1c, params[f"l{l}_ln1_g"])
        grads[f"l{l}_ln1_g"] += dg1
        grads[f"l{l}_ln1_b"] += db1
        dx = dx1 + dx0_ln
    # embeddings
    np.add.at(grads["E"], ids, dx)
    grads["P"][:L] += dx.sum(0)
    return grads


class Tokenizer:
    """Whitespace vocab tokenizer with reserved [PAD]/[UNK]/[QRY]/[PSG]
    ids; truncates to max_len (content-type prefix token included).
    Integer-exact — the DuckDB oracle replays it as a vocab VALUES
    join (registry `transformer_tokenizer_ids`)."""

    def __init__(self, vocab: list[str], max_len: int):
        self.vocab = {t: i for i, t in enumerate(vocab)}
        self.itos = list(vocab)
        self.max_len = max_len

    def encode(self, text: str, content_type: str = "PASSAGE") -> list[int]:
        prefix = QRY if content_type == "QUERY" else PSG
        ids = [prefix]
        for tok in (text or "").lower().split():
            if len(ids) >= self.max_len:
                break
            ids.append(self.vocab.get(tok, UNK))
        return ids

    def batch(self, texts: list[str], content_type: str = "PASSAGE"):
        rows = [self.encode(t, content_type) for t in texts]
        L = max(len(r) for r in rows)
        ids = np.full((len(rows), L), PAD, dtype=np.int64)
        mask = np.zeros((len(rows), L), dtype=np.float64)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1.0
        return ids, mask


class BPETokenizer(Tokenizer):
    """Subword (BPE) tokenizer: lowercase whitespace words → the
    learned merge chain (functions/bpe.py portable convention:
    left-to-right non-overlapping replace where a match consumes its
    right delimiter — identical semantics in Python str.replace, Spark
    `replace`, and DuckDB `replace`, which is what keeps the
    checkpoint's tokenization SQL-replayable) → symbol-id lookup with
    [UNK] fallback, [QRY]/[PSG] prefix, max_len truncation. `vocab` is
    SPECIALS + the symbol inventory; `merges` are 'a b' pair strings
    in learned order — both stored IN the checkpoint, so the model
    carries its whole tokenizer like a sentence-transformers bundle."""

    def __init__(self, vocab: list[str], merges: list[str], max_len: int):
        super().__init__(vocab, max_len)
        self.merges = [str(m) for m in merges]
        self._word_syms: dict[str, list[str]] = {}

    def word_symbols(self, w: str) -> list[str]:
        if w not in self._word_syms:
            s = " " + "".join(c + " " for c in w)  # bpe.symbolize
            for pair in self.merges:
                a, b = pair.split(" ")
                s = s.replace(f" {a} {b} ", f" {a}{b} ")
            self._word_syms[w] = s.split()
        return self._word_syms[w]

    def encode(self, text: str, content_type: str = "PASSAGE") -> list[int]:
        prefix = QRY if content_type == "QUERY" else PSG
        ids = [prefix]
        for w in (text or "").lower().split():
            if len(ids) >= self.max_len:
                break
            for s in self.word_symbols(w):
                if len(ids) >= self.max_len:
                    break
                ids.append(self.vocab.get(s, UNK))
        return ids


class TinyTransformer:
    """Inference wrapper with the registry's encode() contract."""

    def __init__(
        self,
        params: dict[str, np.ndarray],
        vocab: list[str],
        merges: list[str] | None = None,
    ):
        self.params = params
        max_len = int(params["_meta"][2])
        self.tok = (
            BPETokenizer(vocab, merges, max_len)
            if merges is not None
            else Tokenizer(vocab, max_len)
        )

    def encode(
        self, texts: list[str], content_type: str = "PASSAGE"
    ) -> np.ndarray:
        ids, mask = self.tok.batch(texts, content_type)
        return forward(self.params, ids, mask)


def save_checkpoint(
    path: str,
    params: dict[str, np.ndarray],
    vocab: list[str],
    merges: list[str] | None = None,
):
    extra = {}
    if merges is not None:
        extra["merges"] = np.array(merges, dtype=object)
    np.savez(
        path,
        vocab=np.array(vocab, dtype=object),
        **extra,
        **{k: v for k, v in params.items()},
    )


def load_checkpoint(path: str) -> TinyTransformer:
    z = np.load(path, allow_pickle=True)
    vocab = [str(t) for t in z["vocab"]]
    merges = (
        [str(m) for m in z["merges"]] if "merges" in z.files else None
    )
    params = {
        k: z[k] for k in z.files if k not in ("vocab", "merges")
    }
    return TinyTransformer(params, vocab, merges)
