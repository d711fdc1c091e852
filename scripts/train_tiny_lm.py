"""Train a REAL (non-random) tiny llama-architecture checkpoint offline.

The accuracy-eval analogue of the reference's GSM8K gates
(`test/registered/quant/test_w8a8_quantization.py:95`, `test/run_eval.py`):
this environment has no network, so instead of downloading a checkpoint we
TRAIN one on an arithmetic task (2-digit addition) with a held-out split,
export it as a HuggingFace-format safetensors checkpoint, and serve it with
the engine under each quantization mode. Exact-match accuracy on held-out
problems is the GSM8K-style gate: quantization error shows up directly as
wrong sums.

Vocabulary (16 ids): 0=pad, 1=bos, 2=eos, 3..12 = digits 0..9,
13='+', 14='='. A problem "37+58=" is tokenized
[bos, 3+3, 3+7, 13, 3+5, 3+8, 14] and the model must emit the digits of 95
followed by eos.
"""

from __future__ import annotations

import json
import math
import os
from typing import Dict, List, Tuple

import numpy as np

PAD, BOS, EOS, PLUS, EQ = 0, 1, 2, 13, 14
VOCAB = 16
MAX_LEN = 16


def encode_problem(a: int, b: int) -> Tuple[List[int], List[int]]:
    prompt = [BOS] + [3 + int(d) for d in str(a)] + [PLUS] + [
        3 + int(d) for d in str(b)
    ] + [EQ]
    answer = [3 + int(d) for d in str(a + b)] + [EOS]
    return prompt, answer


def decode_answer(ids: List[int]) -> str:
    out = []
    for t in ids:
        if t == EOS:
            break
        if 3 <= t <= 12:
            out.append(str(t - 3))
        else:
            return "<bad>"
    return "".join(out) or "<empty>"


def make_splits(seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """All (a, b) pairs with a,b in [0, 100); 5% held out."""
    rng = np.random.default_rng(seed)
    pairs = np.array([(a, b) for a in range(100) for b in range(100)])
    rng.shuffle(pairs)
    n_eval = 500
    return pairs[n_eval:], pairs[:n_eval]


def hf_config(hidden=128, layers=4, heads=4, kv_heads=2, inter=384) -> dict:
    return dict(
        architectures=["LlamaForCausalLM"],
        model_type="llama",
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        intermediate_size=inter,
        vocab_size=VOCAB,
        max_position_embeddings=64,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        bos_token_id=BOS,
        eos_token_id=EOS,
        torch_dtype="float32",
    )


# --------------------------------------------------------------- training

def _init_params(cfg: dict, seed: int):
    import jax

    rng = np.random.default_rng(seed)
    h, inter = cfg["hidden_size"], cfg["intermediate_size"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = h // nh

    def init(*shape, scale=None):
        scale = scale if scale is not None else 1.0 / math.sqrt(shape[0])
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    vocab = cfg["vocab_size"]
    params = {
        "embed": init(vocab, h, scale=0.02),
        "lm_head": init(h, vocab),
        "final_norm": np.ones(h, np.float32),
        "layers": [],
    }
    for _ in range(cfg["num_hidden_layers"]):
        params["layers"].append(
            {
                "input_norm": np.ones(h, np.float32),
                "post_norm": np.ones(h, np.float32),
                "q": init(h, nh * hd),
                "k": init(h, nkv * hd),
                "v": init(h, nkv * hd),
                "o": init(nh * hd, h),
                "gate": init(h, inter),
                "up": init(h, inter),
                "down": init(inter, h),
            }
        )
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


def _forward(params, cfg, ids):
    """Plain batched causal forward, numerically the same architecture the
    engine serves (rope -> GQA attention -> silu MLP, pre-RMSNorm)."""
    import jax.numpy as jnp

    h_, inter = cfg["hidden_size"], cfg["intermediate_size"]
    nh, nkv = cfg["num_attention_heads"], cfg["num_key_value_heads"]
    hd = h_ // nh
    B, T = ids.shape
    eps = cfg["rms_norm_eps"]

    def rms(x, w):
        return x * jax.lax.rsqrt(
            jnp.mean(x * x, axis=-1, keepdims=True) + eps
        ) * w

    import jax

    pos = jnp.arange(T)
    inv = 1.0 / (
        cfg["rope_theta"]
        ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd)
    )
    ang = pos[:, None] * inv[None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope(x):  # [B, T, n, hd] — rotate-half pairing (HF llama layout)
        x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
        return jnp.concatenate(
            [x1 * cos[None, :, None] - x2 * sin[None, :, None],
             x2 * cos[None, :, None] + x1 * sin[None, :, None]],
            axis=-1,
        )

    x = params["embed"][ids]
    mask = jnp.tril(jnp.ones((T, T), bool))
    for lp in params["layers"]:
        y = rms(x, lp["input_norm"])
        q = rope((y @ lp["q"]).reshape(B, T, nh, hd))
        k = rope((y @ lp["k"]).reshape(B, T, nkv, hd))
        v = (y @ lp["v"]).reshape(B, T, nkv, hd)
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(hd)
        att = jnp.where(mask[None, None], att, -1e30)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bnqk,bknd->bqnd", att, v).reshape(B, T, nh * hd)
        x = x + o @ lp["o"]
        y = rms(x, lp["post_norm"])
        x = x + (jax.nn.silu(y @ lp["gate"]) * (y @ lp["up"])) @ lp["down"]
    x = rms(x, params["final_norm"])
    return x @ params["lm_head"]


def train(steps: int = 3000, seed: int = 0, lr: float = 1e-3,
          batch: int = 128, cfg: dict = None, log=None, batch_fn=None):
    import jax
    import jax.numpy as jnp
    import optax

    cfg = cfg or hf_config()
    train_pairs, _ = make_splits(seed)
    params = _init_params(cfg, seed)
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, lr, 100, steps), 0.9, 0.95
    )
    opt_state = opt.init(params)

    def make_batch(rng):
        idx = rng.integers(0, len(train_pairs), size=batch)
        ids = np.zeros((batch, MAX_LEN), np.int32)
        tgt = np.full((batch, MAX_LEN), -1, np.int32)
        for i, (a, b) in enumerate(train_pairs[idx]):
            p, ans = encode_problem(int(a), int(b))
            seq = p + ans
            ids[i, : len(seq)] = seq
            # loss only on answer tokens (next-token targets)
            for j in range(len(p) - 1, len(seq) - 1):
                tgt[i, j] = seq[j + 1]
        return ids, tgt

    if batch_fn is not None:
        make_batch = lambda rng: batch_fn(rng, batch)  # noqa: E731

    def loss_fn(params, ids, tgt):
        logits = _forward(params, cfg, ids)
        valid = tgt >= 0
        lab = jnp.clip(tgt, 0)
        ll = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(ll, lab[..., None], axis=-1)[..., 0]
        return (nll * valid).sum() / valid.sum()

    @jax.jit
    def step(params, opt_state, ids, tgt):
        loss, g = jax.value_and_grad(loss_fn)(params, ids, tgt)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    rng = np.random.default_rng(seed + 1)
    for i in range(steps):
        ids, tgt = make_batch(rng)
        params, opt_state, loss = step(params, opt_state, ids, tgt)
        if log and (i % 500 == 0 or i == steps - 1):
            log(f"step {i}: loss {float(loss):.4f}")
    return params, cfg


# ---------------------------------------------------------------- export

def export_hf(params, cfg: dict, out_dir: str) -> str:
    """Write a HF-format safetensors checkpoint the engine can load."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    t: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=True):
        a = np.asarray(arr, dtype=np.float32)
        t[name] = a.T.copy() if transpose else a.copy()  # HF is [out, in]

    put("model.embed_tokens.weight", params["embed"], transpose=False)
    put("lm_head.weight", params["lm_head"])
    put("model.norm.weight", params["final_norm"], transpose=False)
    for i, lp in enumerate(params["layers"]):
        p = f"model.layers.{i}"
        put(f"{p}.input_layernorm.weight", lp["input_norm"], transpose=False)
        put(f"{p}.post_attention_layernorm.weight", lp["post_norm"], transpose=False)
        put(f"{p}.self_attn.q_proj.weight", lp["q"])
        put(f"{p}.self_attn.k_proj.weight", lp["k"])
        put(f"{p}.self_attn.v_proj.weight", lp["v"])
        put(f"{p}.self_attn.o_proj.weight", lp["o"])
        put(f"{p}.mlp.gate_proj.weight", lp["gate"])
        put(f"{p}.mlp.up_proj.weight", lp["up"])
        put(f"{p}.mlp.down_proj.weight", lp["down"])
    save_file(t, os.path.join(out_dir, "model.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return out_dir


def train_and_export(out_dir: str, steps: int = 3000, seed: int = 0,
                     log=None) -> str:
    """Train (or reuse a cached checkpoint) and return its directory."""
    marker = os.path.join(out_dir, "model.safetensors")
    if os.path.exists(marker):
        return out_dir
    params, cfg = train(steps=steps, seed=seed, log=log)
    return export_hf(params, cfg, out_dir)


# ------------------------------------------------- repeat/copy task
# A second tiny task for the speculative-decoding demonstration: the model
# learns to repeat a pattern (induction), so generated text genuinely
# matches n-gram proposals from its own context — the workload class where
# NGRAM speculation wins (reference `speculative/ngram_worker.py`).

REP_SEP = 3
REP_VOCAB = 64
REP_LEN = 96


def repeat_batch(rng, batch):
    """[bos, w1..wL, SEP, w1..wL, SEP, ...]; loss after the first SEP."""
    ids = np.zeros((batch, REP_LEN), np.int32)
    tgt = np.full((batch, REP_LEN), -1, np.int32)
    for i in range(batch):
        L = int(rng.integers(4, 11))
        pat = rng.integers(4, REP_VOCAB, size=L).tolist()
        seq = [BOS]
        while len(seq) < REP_LEN:
            seq.extend(pat + [REP_SEP])
        seq = seq[:REP_LEN]
        ids[i] = seq
        first_sep = 1 + L  # index of the first SEP
        for j in range(first_sep, REP_LEN - 1):
            tgt[i, j] = seq[j + 1]
    return ids, tgt


def train_repeat_and_export(out_dir: str, steps: int = 1500, seed: int = 0,
                            log=None) -> str:
    marker = os.path.join(out_dir, "model.safetensors")
    if os.path.exists(marker):
        return out_dir
    cfg = hf_config(hidden=128, layers=2, heads=4, kv_heads=2, inter=256)
    cfg["vocab_size"] = REP_VOCAB
    cfg["max_position_embeddings"] = 4 * REP_LEN
    params, cfg = train(
        steps=steps, seed=seed, cfg=cfg, log=log, batch_fn=repeat_batch
    )
    return export_hf(params, cfg, out_dir)


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_add_lm"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    if len(sys.argv) > 3 and sys.argv[3] == "repeat":
        train_repeat_and_export(out, steps=steps, log=print)
    else:
        train_and_export(out, steps=steps, log=print)
    print(f"checkpoint at {out}")
