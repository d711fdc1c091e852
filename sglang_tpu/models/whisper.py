"""Whisper speech-to-text (encoder-decoder) — the audio modality.

Reference analogue: `srt/models/whisper.py` (WhisperEncoder /
WhisperDecoder / WhisperForConditionalGeneration) and the
`/v1/audio/transcriptions` route (`srt/entrypoints/http_server.py:1583`).

TPU-native shape of the design: transcription is a short bounded
generation (max_target_positions = 448) over a FIXED 1500-frame encoder
memory, so instead of threading cross-attention through the paged-KV
serving scheduler, the whole decode runs as ONE jitted `lax.scan` with a
dense ring KV cache:

- encoder: conv frontend as two im2col matmuls (stride 1 and 2) + MXU
  transformer stack, jitted once per mel-length bucket;
- decoder: per-request cross K/V are projected ONCE from the encoder
  states (448 steps reuse them), self-attention uses a dense [L, T, h, d]
  cache carried through the scan — static shapes, no host round-trips
  inside generation, one dispatch per request batch.

Greedy/temperature sampling; batch dimension supported (B requests of
the same mel bucket decode together).
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _layer_norm(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions (log-scale timescales,
    sin block then cos block)."""
    log_timescale = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


class WhisperForConditionalGeneration:
    """Standalone audio model: not a ModelRunner citizen (encoder-decoder
    with bounded output does not need paged KV); the Engine detects the
    architecture and serves `transcribe()` instead of `generate()`."""

    architectures = ["WhisperForConditionalGeneration"]
    is_audio_model = True

    def __init__(self, hf_config, dtype=jnp.float32):
        c = hf_config if isinstance(hf_config, dict) else hf_config.to_dict()
        self.cfg = c
        self.dtype = dtype
        self.d = c["d_model"]
        self.enc_layers = c["encoder_layers"]
        self.dec_layers = c["decoder_layers"]
        self.enc_heads = c["encoder_attention_heads"]
        self.dec_heads = c["decoder_attention_heads"]
        self.ffn = c.get("encoder_ffn_dim", 4 * self.d)
        self.dec_ffn = c.get("decoder_ffn_dim", 4 * self.d)
        self.n_mels = c.get("num_mel_bins", 80)
        self.vocab = c["vocab_size"]
        self.max_source = c.get("max_source_positions", 1500)
        self.max_target = c.get("max_target_positions", 448)
        self.sot = c.get("decoder_start_token_id", 50258)
        self.eos = c.get("eos_token_id", 50257)
        self.params = None
        self._enc_pos = jnp.asarray(
            _sinusoids(self.max_source, self.d), dtype
        )

    # --------------------------------------------------------------- load

    def load(self, model_path: str):
        import glob

        import safetensors.numpy

        tensors = {}
        files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
        if files:
            for f in files:
                tensors.update(safetensors.numpy.load_file(f))
        else:  # torch .bin fallback
            import torch

            for f in sorted(glob.glob(os.path.join(model_path, "*.bin"))):
                sd = torch.load(f, map_location="cpu", weights_only=True)
                tensors.update(
                    {k: v.to(torch.float32).numpy() for k, v in sd.items()}
                )
        pre = "model." if any(k.startswith("model.") for k in tensors) else ""

        def t(name):
            return jnp.asarray(tensors[pre + name], self.dtype)

        def lin(name):
            w = jnp.asarray(tensors[pre + name + ".weight"], self.dtype).T
            key = pre + name + ".bias"
            b = (
                jnp.asarray(tensors[key], self.dtype)
                if key in tensors
                else jnp.zeros(w.shape[1], self.dtype)
            )
            return {"w": w, "b": b}

        def norm(name):
            return {
                "w": t(name + ".weight"),
                "b": t(name + ".bias"),
            }

        def attn(p, cross=False):
            d = {
                "q": lin(p + ".q_proj"),
                "k": lin(p + ".k_proj"),
                "v": lin(p + ".v_proj"),
                "out": lin(p + ".out_proj"),
            }
            return d

        enc_layers = []
        for i in range(self.enc_layers):
            p = f"encoder.layers.{i}"
            enc_layers.append(
                {
                    "ln1": norm(p + ".self_attn_layer_norm"),
                    "attn": attn(p + ".self_attn"),
                    "ln2": norm(p + ".final_layer_norm"),
                    "fc1": lin(p + ".fc1"),
                    "fc2": lin(p + ".fc2"),
                }
            )
        dec_layers = []
        for i in range(self.dec_layers):
            p = f"decoder.layers.{i}"
            dec_layers.append(
                {
                    "ln1": norm(p + ".self_attn_layer_norm"),
                    "attn": attn(p + ".self_attn"),
                    "ln_x": norm(p + ".encoder_attn_layer_norm"),
                    "xattn": attn(p + ".encoder_attn", cross=True),
                    "ln2": norm(p + ".final_layer_norm"),
                    "fc1": lin(p + ".fc1"),
                    "fc2": lin(p + ".fc2"),
                }
            )
        self.params = {
            "conv1_w": t("encoder.conv1.weight"),  # [d, mels, 3]
            "conv1_b": t("encoder.conv1.bias"),
            "conv2_w": t("encoder.conv2.weight"),  # [d, d, 3]
            "conv2_b": t("encoder.conv2.bias"),
            "enc_ln": norm("encoder.layer_norm"),
            "enc_layers": enc_layers,
            "dec_embed": t("decoder.embed_tokens.weight"),  # [V, d]
            "dec_pos": t("decoder.embed_positions.weight"),  # [448, d]
            "dec_ln": norm("decoder.layer_norm"),
            "dec_layers": dec_layers,
        }
        return self

    # ------------------------------------------------------------ encoder

    def _mha(self, lp, q_in, kv_in, heads, causal_upto=None, scale=None):
        d = self.d
        hd = d // heads
        q = (q_in @ lp["q"]["w"] + lp["q"]["b"]) * (
            scale if scale is not None else hd**-0.5
        )
        k = kv_in @ lp["k"]["w"] + lp["k"]["b"]
        v = kv_in @ lp["v"]["w"] + lp["v"]["b"]
        tq, tk = q.shape[-2], k.shape[-2]
        qh = q.reshape(q.shape[:-1] + (heads, hd))
        kh = k.reshape(k.shape[:-1] + (heads, hd))
        vh = v.reshape(v.shape[:-1] + (heads, hd))
        s = jnp.einsum("...qhd,...khd->...hqk", qh, kh)
        if causal_upto is not None:
            mask = jnp.tril(jnp.ones((tq, tk), bool))
            s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("...hqk,...khd->...qhd", p, vh).reshape(
            q.shape[:-1] + (d,)
        )
        return o @ lp["out"]["w"] + lp["out"]["b"]

    def encode(self, params, mel: jax.Array) -> jax.Array:
        """mel [B, n_mels, T] -> encoder states [B, T//2, d]."""
        # conv1 (k=3, s=1, pad 1) then conv2 (k=3, s=2, pad 1), both as
        # im2col matmuls (the MXU path; no conv primitive needed)
        def conv1d(x, w, b, stride):
            # x [B, C, T], w [O, C, 3]
            xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
            t_out = (x.shape[2] + stride - 1) // stride
            cols = jnp.stack(
                [
                    xp[:, :, i : i + stride * t_out : stride][:, :, :t_out]
                    for i in range(3)
                ],
                axis=-1,
            )  # [B, C, T', 3] with T' = ceil(T/stride)
            flat = cols.transpose(0, 2, 1, 3).reshape(
                x.shape[0], t_out, x.shape[1] * 3
            )
            wf = w.transpose(1, 2, 0).reshape(x.shape[1] * 3, w.shape[0])
            return flat @ wf + b

        h = jax.nn.gelu(conv1d(mel, params["conv1_w"], params["conv1_b"], 1))
        h = h.transpose(0, 2, 1)  # back to [B, C, T]
        h = jax.nn.gelu(conv1d(h, params["conv2_w"], params["conv2_b"], 2))
        t_out = h.shape[1]
        h = h + self._enc_pos[:t_out]
        for lp in params["enc_layers"]:
            a = _layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"])
            h = h + self._mha(lp["attn"], a, a, self.enc_heads)
            a = _layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"])
            h = h + (
                jax.nn.gelu(a @ lp["fc1"]["w"] + lp["fc1"]["b"])
                @ lp["fc2"]["w"]
                + lp["fc2"]["b"]
            )
        return _layer_norm(h, params["enc_ln"]["w"], params["enc_ln"]["b"])

    # ------------------------------------------------------------ decoder

    def _cross_kv(self, params, enc: jax.Array):
        """Project the encoder memory once per request: [L][B, S, h, hd]x2."""
        hd = self.d // self.dec_heads
        ks, vs = [], []
        for lp in params["dec_layers"]:
            x = lp["xattn"]
            k = enc @ x["k"]["w"] + x["k"]["b"]
            v = enc @ x["v"]["w"] + x["v"]["b"]
            ks.append(k.reshape(k.shape[:-1] + (self.dec_heads, hd)))
            vs.append(v.reshape(v.shape[:-1] + (self.dec_heads, hd)))
        return jnp.stack(ks), jnp.stack(vs)  # [L, B, S, h, hd]

    def _decoder_step(self, params, ids, pos, self_k, self_v, xk, xv):
        """One decoder position for a batch: ids [B], pos scalar;
        self_k/v [L, B, Tmax, h, hd] rings (updated at `pos`)."""
        heads = self.dec_heads
        hd = self.d // heads
        h = params["dec_embed"][ids] + params["dec_pos"][pos]
        h = h[:, None, :]  # [B, 1, d]
        for i, lp in enumerate(params["dec_layers"]):
            a = _layer_norm(h, lp["ln1"]["w"], lp["ln1"]["b"])
            at = lp["attn"]
            q = (a @ at["q"]["w"] + at["q"]["b"]) * hd**-0.5
            k1 = a @ at["k"]["w"] + at["k"]["b"]
            v1 = a @ at["v"]["w"] + at["v"]["b"]
            self_k = self_k.at[i, :, pos].set(
                k1[:, 0].reshape(-1, heads, hd)
            )
            self_v = self_v.at[i, :, pos].set(
                v1[:, 0].reshape(-1, heads, hd)
            )
            qh = q.reshape(q.shape[0], heads, hd)
            keys = self_k[i]  # [B, Tmax, h, hd]
            vals = self_v[i]
            s = jnp.einsum("bhd,bkhd->bhk", qh[:, :], keys)
            tmax = keys.shape[1]
            mask = jnp.arange(tmax)[None, None, :] <= pos
            s = jnp.where(mask, s, -1e30)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            o = jnp.einsum("bhk,bkhd->bhd", p, vals).reshape(
                q.shape[0], 1, self.d
            )
            h = h + (o[:, 0] @ at["out"]["w"] + at["out"]["b"])[:, None]
            # cross attention over the fixed encoder memory
            a = _layer_norm(h, lp["ln_x"]["w"], lp["ln_x"]["b"])
            xt = lp["xattn"]
            q = (a @ xt["q"]["w"] + xt["q"]["b"]) * hd**-0.5
            qh = q.reshape(q.shape[0], heads, hd)
            s = jnp.einsum("bhd,bkhd->bhk", qh, xk[i])
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
            o = jnp.einsum("bhk,bkhd->bhd", p, xv[i]).reshape(
                q.shape[0], 1, self.d
            )
            h = h + (o[:, 0] @ xt["out"]["w"] + xt["out"]["b"])[:, None]
            a = _layer_norm(h, lp["ln2"]["w"], lp["ln2"]["b"])
            h = h + (
                jax.nn.gelu(a @ lp["fc1"]["w"] + lp["fc1"]["b"])
                @ lp["fc2"]["w"]
                + lp["fc2"]["b"]
            )
        h = _layer_norm(h, params["dec_ln"]["w"], params["dec_ln"]["b"])
        logits = h[:, 0] @ params["dec_embed"].T  # tied lm head
        return logits, self_k, self_v

    # ----------------------------------------------------------- generate

    @functools.partial(jax.jit, static_argnames=("self", "max_new", "n_prompt"))
    def _generate_jit(self, params, mel, prompt_ids, max_new, n_prompt, rng, temperature):
        enc = self.encode(params, mel)
        xk, xv = self._cross_kv(params, enc)
        B = mel.shape[0]
        heads, hd = self.dec_heads, self.d // self.dec_heads
        tmax = n_prompt + max_new
        self_k = jnp.zeros((self.dec_layers, B, tmax, heads, hd), self.dtype)
        self_v = jnp.zeros_like(self_k)

        def body(carry, pos):
            ids, self_k, self_v, cur, done, key = carry
            logits, self_k, self_v = self._decoder_step(
                params, cur, pos, self_k, self_v, xk, xv
            )
            key, sub = jax.random.split(key)
            greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            sampled = jax.random.categorical(
                sub, logits / jnp.maximum(temperature, 1e-6)
            ).astype(jnp.int32)
            nxt = jnp.where(temperature > 0, sampled, greedy)
            # while the prompt lasts, force-feed it (teacher forcing)
            in_prompt = pos + 1 < n_prompt
            nxt = jnp.where(in_prompt, prompt_ids[:, jnp.minimum(pos + 1, n_prompt - 1)], nxt)
            nxt = jnp.where(done, self.eos, nxt)
            done = done | ((~in_prompt) & (nxt == self.eos))
            ids = ids.at[:, pos + 1].set(nxt)
            return (ids, self_k, self_v, nxt, done, key), None

        ids0 = jnp.full((B, tmax + 1), self.eos, jnp.int32)
        ids0 = ids0.at[:, :n_prompt].set(prompt_ids)
        carry = (
            ids0,
            self_k,
            self_v,
            prompt_ids[:, 0],
            jnp.zeros(B, bool),
            rng,
        )
        # feed prompt positions then generate
        carry, _ = jax.lax.scan(
            body, carry, jnp.arange(tmax - 1, dtype=jnp.int32)
        )
        return carry[0]

    def transcribe_ids(
        self,
        mel: np.ndarray,  # [B, n_mels, T] log-mel features
        prompt_ids: Optional[List[int]] = None,
        max_new_tokens: int = 128,
        temperature: float = 0.0,
        seed: int = 0,
    ) -> List[List[int]]:
        """Generate token ids for a batch of mel features. `prompt_ids`
        is the decoder prefix (default: [decoder_start_token_id] — callers
        wanting HF-style forced language/task tokens pass them here)."""
        assert self.params is not None, "call load() first"
        if mel.ndim == 2:
            mel = mel[None]
        B = mel.shape[0]
        if prompt_ids is None:
            prompt_ids = [self.sot]
        n_prompt = len(prompt_ids)
        max_new = min(max_new_tokens, self.max_target - n_prompt - 1)
        pid = jnp.asarray(
            np.tile(np.asarray(prompt_ids, np.int32), (B, 1))
        )
        ids = self._generate_jit(
            self.params,
            jnp.asarray(mel, self.dtype),
            pid,
            max_new,
            n_prompt,
            jax.random.PRNGKey(seed),
            jnp.float32(temperature),
        )
        ids = np.asarray(ids)
        outs = []
        for b in range(B):
            row = ids[b, n_prompt:].tolist()
            if self.eos in row:
                row = row[: row.index(self.eos)]
            outs.append(row)
        return outs
