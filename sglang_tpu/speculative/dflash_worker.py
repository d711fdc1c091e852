"""DFLASH speculative decoding (S5 — reference
`srt/speculative/dflash_worker.py` + `srt/models/dflash.py`).

Block drafting: instead of autoregressing K draft steps (EAGLE), the draft
transformer predicts the whole K-token block in ONE forward. Inputs are
EMBEDDINGS only (the draft has no embed/lm_head of its own):

- context positions: `hidden_norm(fc(concat target-layer features))` — the
  target captures the same multi-layer aux features as EAGLE3
  (`layers_to_capture`), projected into the draft width;
- block positions: the TARGET embedding of the draft config's MASK token,
  repeated K times at positions P..P+K-1.

One ragged draft forward yields hidden states for the K mask rows; the
TARGET lm_head decodes them into the draft block. Verification is the
standard lossless TARGET_VERIFY round (`scheduler._forward_spec_decode`).

Attention inside the block is CAUSAL here (the unified ragged kernel's
mask); a bidirectional-within-block variant would need a dedicated mask —
noted as the fidelity gap vs reference DFlash checkpoints.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.model_executor.forward_batch_info import make_extend_batch
from sglang_tpu.model_loader.loader import load_model_weights
from sglang_tpu.models.dflash import DflashDraftModel
from sglang_tpu.speculative.eagle_worker import _DraftState, _pad, _pad2
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.utils import cdiv, pad_to_bucket


class DflashWorker:
    """Block-draft worker; scheduler-facing API identical to EagleWorker's
    chain mode (propose_batch / observe_features / drop / num_draft)."""

    def __init__(self, server_args, target_runner):
        self.t_runner = target_runner
        tcfg = target_runner.model_config
        cfg = ModelConfig.load(
            server_args.speculative_draft_model_path,
            dtype=server_args.dtype,
            context_length=tcfg.context_length,
        )
        assert cfg.hidden_size == tcfg.hidden_size, (
            "DFLASH draft hidden size must equal the target's"
        )
        hf = cfg.hf_config
        L = tcfg.num_hidden_layers
        cap = hf.get("target_layer_ids") or sorted(
            {min(2, L - 1), L // 2, max(L - 3, 0)}
        )
        target_runner.model.layers_to_capture = list(cap)
        target_runner.capture_aux = True
        self.model = DflashDraftModel(cfg, num_context=len(cap))
        self.params = load_model_weights(
            self.model, cfg, target_runner.mesh,
            load_format=server_args.load_format, seed=server_args.random_seed,
        )
        self.cfg = cfg
        self.mask_token_id = int(
            hf.get("mask_token_id", tcfg.vocab_size - 1)
        )
        self.page_size = server_args.page_size
        ps = self.page_size
        self.num_pages = target_runner.num_pages
        shape = (self.num_pages, 2 * cfg.num_key_value_heads, ps, cfg.head_dim)
        self.kv_layers = [
            jnp.zeros(shape, dtype=cfg.dtype)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.allocator = PageAllocator(self.num_pages, ps)
        self.backend = target_runner.attn_backend
        self.num_draft = min(
            server_args.speculative_num_draft_tokens,
            int(hf.get("dflash_block_size", 16)),
        )
        self.feat_dim = len(cap) * cfg.hidden_size
        self.max_pages_per_req = target_runner.max_pages_per_req
        self.states: Dict[str, _DraftState] = {}
        self._jit_cache: dict = {}

    # ----------------------------------------------------------- plumbing

    def observe_features(self, rid: str, start_pos: int, rows) -> None:
        st = self.states.get(rid)
        if st is None:
            st = self.states[rid] = _DraftState()
        for j in range(len(rows)):
            st.feats[start_pos + j] = rows[j]

    def drop(self, rid: str) -> None:
        st = self.states.pop(rid, None)
        if st is not None:
            self.allocator.free(st.pages)
            self.allocator.free(st.scratch)

    def _ensure_pages(self, st: _DraftState, tokens: int) -> bool:
        need = cdiv(tokens, self.page_size) - len(st.pages)
        if need > 0:
            pages = self.allocator.alloc(need)
            if pages is None:
                return False
            st.pages.extend(pages)
        return True

    def _slot(self, st: _DraftState, pos: int) -> int:
        return st.pages[pos // self.page_size] * self.page_size + pos % self.page_size

    def _target_slot(self, r, pos: int) -> int:
        return r.pages[pos // self.page_size] * self.page_size + pos % self.page_size

    def _block_fn(self, tt: int, bb: int, k: int):
        """One jitted forward over [context-catch-up rows | K mask rows per
        request]; returns argmax target-token ids for every packed row."""
        key = ("dflash", tt, bb, k)
        if key not in self._jit_cache:

            def _fwd(params, tparams, kv, fb, embeds):
                h, new_kv = self.model.forward_embeds(
                    params, kv, fb, self.backend, embeds
                )
                logits = self.t_runner.model.compute_logits(tparams, h)
                return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_kv

            self._jit_cache[key] = jax.jit(_fwd, donate_argnums=(2,))
        return self._jit_cache[key]

    def _project_fn(self):
        if "proj" not in self._jit_cache:
            self._jit_cache["proj"] = jax.jit(
                lambda params, aux: self.model.project(params, aux)
            )
        return self._jit_cache["proj"]

    # ------------------------------------------------------------ propose

    def propose_batch(self, reqs) -> List[List[int]]:
        k = self.num_draft
        max_rows = self.t_runner.extend_seq_bucket
        max_tokens = self.t_runner.prefill_token_buckets[-1]
        active = []
        for r in reqs:
            if len(active) >= max_rows:
                break
            if len(r.fill_ids) < 1:
                continue
            st = self.states.get(r.rid)
            if st is None:
                st = self.states[r.rid] = _DraftState()
            P = len(r.fill_ids)
            if not self._ensure_pages(st, P + k):
                continue
            # one block forward needs (P - confirmed) + k rows in budget
            if P - st.confirmed + k > max_tokens:
                continue  # very long first round: fall back this round
            if any(p not in st.feats for p in range(st.confirmed, P - 1)):
                # feature not captured for some prior position (e.g. after
                # retraction): recompute via the target
                self._recompute_feats(r, st, P - 1)
            active.append((r, st))
        if not active:
            return [[] for _ in reqs]

        b = len(active)
        embeds_list: List[np.ndarray] = []
        d_ids: List[int] = []
        d_pos: List[int] = []
        d_loc: List[int] = []
        d_seq = np.zeros(b, dtype=np.int32)
        d_ext = np.zeros(b, dtype=np.int32)
        d_pt = np.zeros((b, self.max_pages_per_req), dtype=np.int32)
        proj = self._project_fn()
        embed_table = None
        block_rows: List[tuple] = []  # (req index, packed offset of block)
        off = 0
        for j, (r, st) in enumerate(active):
            P = len(r.fill_ids)
            c = st.confirmed
            # context rows: positions [c, P-1) projected target features
            n_ctx = max(0, (P - 1) - c)
            if n_ctx > 0:
                aux = np.stack(
                    [st.feats[p] for p in range(c, P - 1)], axis=0
                )
                ctx_emb = np.asarray(
                    proj(self.params, jnp.asarray(aux, dtype=self.cfg.dtype)),
                    dtype=np.float32,
                )
            else:
                ctx_emb = np.zeros((0, self.cfg.hidden_size), np.float32)
            if embed_table is None:
                embed_table = np.asarray(
                    jax.device_get(
                        self.t_runner._params()["embed"][self.mask_token_id]
                    ),
                    dtype=np.float32,
                )
            blk_emb = np.broadcast_to(
                embed_table, (k, self.cfg.hidden_size)
            ).copy()
            embeds_list += [ctx_emb, blk_emb]
            # positions: context [c, P-1), block [P-1, P-1+k)
            d_pos.extend(range(c, P - 1))
            d_pos.extend(range(P - 1, P - 1 + k))
            d_loc.extend(self._slot(st, p) for p in range(c, P - 1 + k))
            d_ids.extend([0] * (n_ctx + k))
            block_rows.append((j, off + n_ctx))
            off += n_ctx + k
            d_seq[j] = P - 1 + k
            d_ext[j] = n_ctx + k
            d_pt[j, : len(st.pages)] = st.pages

        t = len(d_ids)
        tt = pad_to_bucket(t, self.t_runner.prefill_token_buckets)
        bb = pad_to_bucket(b, [max_rows])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : b + 1] = np.cumsum(d_ext)
        cu[b + 1 :] = cu[b]
        embeds = np.zeros((tt, self.cfg.hidden_size), dtype=np.float32)
        embeds[:t] = np.concatenate(embeds_list, axis=0)
        fb = make_extend_batch(
            _pad(np.asarray(d_ids, dtype=np.int32), tt),
            _pad(np.asarray(d_pos, dtype=np.int32), tt),
            _pad(np.asarray(d_loc, dtype=np.int32), tt),
            _pad2(d_pt, bb, self.max_pages_per_req),
            _pad(d_seq, bb),
            cu,
        )
        fn = self._block_fn(tt, bb, k)
        ids, self.kv_layers = fn(
            self.params,
            self.t_runner._params(),
            self.kv_layers,
            fb,
            jnp.asarray(embeds, dtype=self.cfg.dtype),
        )
        ids = np.asarray(ids)
        drafts: List[List[int]] = [[] for _ in range(b)]
        for j, blk_off in block_rows:
            r, st = active[j]
            drafts[j] = [int(x) for x in ids[blk_off : blk_off + k]]
            st.confirmed = len(r.fill_ids) - 1
            st.feats = {p: v for p, v in st.feats.items() if p >= st.confirmed}
        by_rid = {r.rid: d for (r, _), d in zip(active, drafts)}
        return [by_rid.get(r.rid, []) for r in reqs]

    def _recompute_feats(self, r, st, upto: int) -> None:
        """Target aux recompute for positions [confirmed, upto) (first
        round / post-retraction); `capture_aux` makes forward_extend_hidden
        return the fused multi-layer rows."""
        c = st.confirmed
        if upto <= c:
            return
        fill = r.fill_ids
        pmax = self.t_runner.max_pages_per_req
        pt = np.zeros((1, pmax), dtype=np.int32)
        pt[0, : len(r.pages)] = r.pages
        rec = self.t_runner.forward_extend_hidden(
            np.asarray(fill[c:upto], dtype=np.int32),
            np.arange(c, upto, dtype=np.int32),
            np.asarray(
                [self._target_slot(r, p) for p in range(c, upto)],
                dtype=np.int32,
            ),
            pt,
            np.array([upto], dtype=np.int32),
            np.array([upto - c], dtype=np.int32),
        )
        for j, p in enumerate(range(c, upto)):
            st.feats[p] = rec[j]
