"""EAGLE speculative decoding (chain drafts, greedy-lossless).

Parity with reference `srt/speculative/eagle_worker.py` (EAGLEWorker): an
EAGLE-1 draft head (`models/eagle.py`) autoregresses at the FEATURE level
— each draft step consumes (previous-position feature, current token) and
emits the next feature, decoded through the TARGET model's lm_head. The
target then verifies the k-token chain in one ragged TARGET_VERIFY
forward, so output is identical to plain target greedy decoding.

Worker design mirrors `standalone_worker.py` (rollback-free): per request
it tracks `confirmed` = feature pairs whose draft KV is valid. Each round
it (a) recomputes target features for newly committed positions via
`ModelRunner.forward_extend_hidden` (a deliberate v1 trade: the reference
captures features during the target's own extend/verify passes instead of
recomputing — that capture is the planned r2 optimization), (b) catch-up
-extends the draft over the new (feature, token) pairs, taking d1 from
the last row, then (c) chains k-1 single-token draft steps feeding the
draft's own output features back in.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.model_executor.forward_batch_info import (
    make_decode_batch,
    make_extend_batch,
)
from sglang_tpu.model_loader.loader import load_model_weights
from sglang_tpu.models.eagle import EagleLlamaForCausalLM
from sglang_tpu.utils import cdiv, get_logger, pad_to_bucket

logger = get_logger(__name__)


class _DraftState:
    __slots__ = ("pages", "confirmed", "feats", "scratch")

    def __init__(self):
        self.pages: List[int] = []
        self.confirmed = 0  # (feature, token) pairs with valid draft KV
        self.scratch: List[int] = []  # per-beam draft pages (tree mode)
        # target features captured from verify forwards, keyed by position
        # (pruned below `confirmed` after each catch-up)
        self.feats: dict = {}


class EagleWorker:
    """Feature-level draft worker. mode="eagle": separate EAGLE-1 head
    checkpoint. mode="mtp": the DeepSeek MTP layer living INSIDE the
    target checkpoint (reference NEXTN), which carries its own output
    head."""

    def __init__(self, server_args, target_runner, mode: str = "eagle"):
        self.t_runner = target_runner
        self.mode = mode
        tcfg = target_runner.model_config
        if mode == "mtp":
            from sglang_tpu.models.deepseek_mtp import DeepseekMTPModel

            cfg = tcfg
            self.model = DeepseekMTPModel(
                tcfg, layer_index=tcfg.hf_config["num_hidden_layers"]
            )
            cfg = self.model.config  # copy with num_hidden_layers=1
            load_cfg = ModelConfig.load(
                server_args.speculative_draft_model_path
                or server_args.model_path,
                dtype=server_args.dtype,
                context_length=tcfg.context_length,
            )
            load_cfg.model_path = (
                server_args.speculative_draft_model_path
                or server_args.model_path
            )
            cfg.model_path = load_cfg.model_path
        elif mode == "eagle3":
            from sglang_tpu.models.eagle3 import Eagle3LlamaForCausalLM

            cfg = ModelConfig.load(
                server_args.speculative_draft_model_path,
                dtype=server_args.dtype,
                context_length=tcfg.context_length,
            )
            assert cfg.hidden_size == tcfg.hidden_size, (
                "EAGLE3 draft hidden size must equal the target's"
            )
            # target aux capture (reference set_eagle3_layers_to_capture:
            # hidden entering layers [2, L//2, L-3]); must be configured
            # BEFORE the runner's first verify/extend-hidden jit trace
            L = tcfg.num_hidden_layers
            cap = sorted({min(2, L - 1), L // 2, max(L - 3, 0)})
            target_runner.model.layers_to_capture = cap
            target_runner.capture_aux = True
            self.model = Eagle3LlamaForCausalLM(cfg, num_aux=len(cap))
        else:
            cfg = ModelConfig.load(
                server_args.speculative_draft_model_path,
                dtype=server_args.dtype,
                context_length=tcfg.context_length,
            )
            assert cfg.vocab_size == tcfg.vocab_size, "EAGLE draft vocab mismatch"
            assert cfg.hidden_size == tcfg.hidden_size, (
                "EAGLE draft hidden size must equal the target's (fc concat)"
            )
            self.model = EagleLlamaForCausalLM(cfg)
        self.params = load_model_weights(
            self.model,
            cfg,
            target_runner.mesh,
            load_format=server_args.load_format,
            seed=server_args.random_seed,
        )
        self.cfg = cfg
        self.page_size = server_args.page_size
        ps = self.page_size
        # draft KV is 1-2 layers — size it like the target's pool
        self.num_pages = target_runner.num_pages
        shape = (self.num_pages, 2 * cfg.num_key_value_heads, ps, cfg.head_dim)
        self.kv_layers = [
            jnp.zeros(shape, dtype=cfg.dtype) for _ in range(cfg.num_hidden_layers)
        ]
        self.allocator = PageAllocator(self.num_pages, ps)
        self.backend = target_runner.attn_backend
        self.num_draft = min(server_args.speculative_num_draft_tokens, 7)
        # target-feature row width: EAGLE3 fuses num_aux captured layers
        self.feat_dim = (
            self.model.num_aux * cfg.hidden_size
            if mode == "eagle3"
            else cfg.hidden_size
        )
        self.max_pages_per_req = target_runner.max_pages_per_req
        self.states: Dict[str, _DraftState] = {}
        self._jit_cache: dict = {}

    # ----------------------------------------------------------- plumbing

    def observe_features(self, rid: str, start_pos: int, rows) -> None:
        """Store target features captured by the verify forward (positions
        start_pos..start_pos+len(rows)-1) — the catch-up extend then skips
        its target recompute for these positions."""
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

    # ------------------------------------------------------------- steps

    def _head_logits(self, params, tparams, h):
        """Draft output head: MTP/EAGLE3 carry their own; EAGLE-1 decodes
        through the TARGET lm_head."""
        if self.mode in ("mtp", "eagle3"):
            return self.model.compute_logits(params, h)
        return self.t_runner.model.compute_logits(tparams, h)

    def _map_ids(self, params, ids):
        """EAGLE3 d2t: draft-vocab id -> target-vocab id."""
        if self.mode == "eagle3":
            return self.model.map_draft_ids(params, ids)
        return ids

    def _extend_topk_fn(self, tt: int, bb: int, tk: int):
        key = ("dext_topk", tt, bb, tk)
        if key not in self._jit_cache:

            def _ext(params, tparams, kv, fb, feats, last_idx):
                h, new_kv = self.model.forward_with_features(
                    params, kv, fb, self.backend, feats
                )
                h_last = h[last_idx]
                logits = self._head_logits(params, tparams, h_last)
                _, top_ids = jax.lax.top_k(logits, tk)
                top_ids = self._map_ids(params, top_ids.astype(jnp.int32))
                return top_ids.astype(jnp.int32), h_last, new_kv

            self._jit_cache[key] = jax.jit(_ext, donate_argnums=(2,))
        return self._jit_cache[key]

    def _extend_fn(self, tt: int, bb: int):
        key = ("dext", tt, bb)
        if key not in self._jit_cache:

            def _ext(params, tparams, kv, fb, feats, last_idx):
                h, new_kv = self.model.forward_with_features(
                    params, kv, fb, self.backend, feats
                )
                h_last = h[last_idx]  # [bb, H] draft feature per seq
                logits = self._head_logits(params, tparams, h_last)
                ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return self._map_ids(params, ids), h_last, new_kv

            self._jit_cache[key] = jax.jit(_ext, donate_argnums=(2,))
        return self._jit_cache[key]

    def _decode_fn(self, bb: int):
        key = ("ddec", bb)
        if key not in self._jit_cache:

            def _dec(params, tparams, kv, fb, feats):
                h, new_kv = self.model.forward_with_features(
                    params, kv, fb, self.backend, feats
                )
                logits = self._head_logits(params, tparams, h)
                ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return self._map_ids(params, ids), h, new_kv

            self._jit_cache[key] = jax.jit(_dec, donate_argnums=(2,))
        return self._jit_cache[key]

    # ------------------------------------------------------- tree propose

    def propose_tree(self, reqs, tree_width: int):
        """Root-branched chains (EAGLE-2-lite): the draft's top-`tree_width`
        first tokens each continue greedily for k-1 steps on their own
        scratch page, giving `tree_width` candidate paths per request.
        Returns per-request List[List[int]] paths (possibly empty)."""
        k = self.num_draft
        tk = tree_width
        max_rows = self.t_runner.extend_seq_bucket
        max_chain_rows = min(max_rows, self.t_runner.decode_bs_buckets[-1])
        active = []
        for r in reqs:
            if (len(active) + 1) * tk > max_chain_rows:
                break
            if len(r.fill_ids) < 2:
                continue
            st = self.states.get(r.rid)
            if st is None:
                st = self.states[r.rid] = _DraftState()
            if not self._ensure_pages(st, len(r.fill_ids)):
                continue
            while len(st.scratch) < tk:
                pg = self.allocator.alloc(1)
                if pg is None:
                    break
                st.scratch.extend(pg)
            if len(st.scratch) < tk:
                continue
            active.append((r, st))
        if not active:
            return [[] for _ in reqs]

        b = len(active)
        drafts: List[List[int]] = [[] for _ in range(b)]
        feats_last = np.zeros((b, self.cfg.hidden_size), dtype=np.float32)
        # (a)+(b) catch-up with TOPK first tokens
        max_tokens = self.t_runner.prefill_token_buckets[-1]
        top1: List[List[int]] = [None] * b
        while True:
            pending = [
                (gi, r, st)
                for gi, (r, st) in enumerate(active)
                if st.confirmed < len(r.fill_ids) - 1
            ]
            if not pending:
                break
            group = []
            tok_sum = 0
            for gi, r, st in pending:
                P = len(r.fill_ids) - 1
                c = st.confirmed
                n = P - c
                if not group and n > max_tokens:
                    group.append((gi, r, st, c, c + max_tokens))
                    break
                if tok_sum + n > max_tokens or len(group) >= max_rows:
                    break
                group.append((gi, r, st, c, P))
                tok_sum += n
            self._catchup_group(
                group, drafts, feats_last, topk=tk, topk_out=top1
            )

        # (c) tk root candidates each continue greedily: rows = b*tk
        paths = [
            [[int(top1[i][j])] for j in range(tk)] for i in range(b)
        ]
        rows = b * tk
        bb = pad_to_bucket(rows, self.t_runner.decode_bs_buckets)
        pmax = self.max_pages_per_req
        page_table = np.zeros((bb, pmax), dtype=np.int32)
        copy_pairs = []  # (src_page, dst_page, valid_slots)
        for i, (r, st) in enumerate(active):
            P = len(r.fill_ids) - 1
            idx = P // self.page_size
            off = P % self.page_size
            for j in range(tk):
                row = i * tk + j
                pt = list(st.pages)
                # the beam's chain positions live on its scratch page,
                # which REPLACES P's page in this row's table — so the
                # confirmed KV sharing that page is copied in first
                pt[idx] = st.scratch[j]
                page_table[row, : len(pt)] = pt
                if off > 0:
                    copy_pairs.append((st.pages[idx], st.scratch[j], off))
        self._copy_partial_pages(copy_pairs)
        # chain depth capped so P..P+depth-1 stays within that one page
        # (_tree_depth); deeper trees would need a second scratch page.
        feats_rows = np.repeat(feats_last, tk, axis=0)
        dec = self._decode_fn(bb)
        depth = self._tree_depth(active, k)
        for step in range(depth - 1):
            ids = np.zeros(bb, dtype=np.int32)
            pos = np.zeros(bb, dtype=np.int32)
            loc = np.zeros(bb, dtype=np.int32)
            sl = np.zeros(bb, dtype=np.int32)
            for i, (r, st) in enumerate(active):
                P = len(r.fill_ids) - 1
                p = st.confirmed + step
                for j in range(tk):
                    row = i * tk + j
                    ids[row] = paths[i][j][-1]
                    pos[row] = p
                    loc[row] = st.scratch[j] * self.page_size + p % self.page_size
                    sl[row] = p + 1
            fb = make_decode_batch(ids, pos, loc, page_table, sl)
            feats = np.zeros((bb, self.cfg.hidden_size), dtype=np.float32)
            feats[:rows] = feats_rows
            out, h, self.kv_layers = dec(
                self.params,
                self.t_runner._params(),
                self.kv_layers,
                fb,
                jnp.asarray(feats, dtype=self.cfg.dtype),
            )
            out = np.asarray(out)[:rows]
            feats_rows = np.asarray(h, dtype=np.float32)[:rows]
            for i in range(b):
                for j in range(tk):
                    paths[i][j].append(int(out[i * tk + j]))
        by_rid = {r.rid: paths[i] for i, (r, _) in enumerate(active)}
        return [by_rid.get(r.rid, []) for r in reqs]

    def _copy_partial_pages(self, pairs) -> None:
        """Copy the first `off` slots of src draft pages into dst scratch
        pages (beam rows must still see the confirmed KV that shares P's
        page). One donated jit per count bucket; pad rows target the
        garbage page 0."""
        if not pairs:
            return
        from sglang_tpu.utils import next_power_of_2

        m = len(pairs)
        mb = next_power_of_2(m)
        src = np.zeros(mb, np.int32)
        dst = np.zeros(mb, np.int32)
        off = np.zeros(mb, np.int32)
        for i, (s_, d_, o_) in enumerate(pairs):
            src[i], dst[i], off[i] = s_, d_, o_
        key = ("pcopy", mb)
        if key not in self._jit_cache:
            ps = self.page_size

            def _copy(kv_layers, src, dst, off):
                rows = jnp.arange(ps)
                mask = rows[None, :] < off[:, None]  # [m, ps]
                out = []
                # head-major pages [P, 2kvh, ps, d]: token dim is axis 2
                for l in kv_layers:
                    vals = jnp.where(
                        mask[:, None, :, None], l[src], l[dst]
                    )
                    out.append(l.at[dst].set(vals))
                return out

            self._jit_cache[key] = jax.jit(_copy, donate_argnums=(0,))
        self.kv_layers = self._jit_cache[key](
            self.kv_layers, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(off)
        )

    def _tree_depth(self, active, k: int) -> int:
        """Chain depth such that draft positions stay within the scratch
        page that starts at P's page (one page per beam)."""
        ps = self.page_size
        depth = k
        for r, st in active:
            P = len(r.fill_ids) - 1
            room = ps - (P % ps)  # slots left in P's page
            depth = min(depth, room)
        return max(1, depth)

    # ------------------------------------------------------------ propose

    def propose_batch(self, reqs) -> List[List[int]]:
        k = self.num_draft
        max_rows = self.t_runner.extend_seq_bucket
        active = []
        for r in reqs:
            if len(active) >= max_rows:
                break
            if len(r.fill_ids) < 2:
                continue  # no prior feature to condition on yet
            st = self.states.get(r.rid)
            if st is None:
                st = self.states[r.rid] = _DraftState()
            if not self._ensure_pages(st, len(r.fill_ids) + k):
                continue
            active.append((r, st))
        if not active:
            return [[] for _ in reqs]

        b = len(active)
        drafts: List[List[int]] = [[] for _ in range(b)]
        feats_last = np.zeros((b, self.cfg.hidden_size), dtype=np.float32)

        # ---- (a)+(b): target feature catch-up + draft extend, grouped to
        # the prefill token budget; an oversized request (first round of a
        # long prompt) is processed alone in sub-chunks.
        max_tokens = self.t_runner.prefill_token_buckets[-1]
        while True:
            pending = [
                (gi, r, st)
                for gi, (r, st) in enumerate(active)
                if st.confirmed < len(r.fill_ids) - 1
            ]
            if not pending:
                break
            group = []
            tok_sum = 0
            for gi, r, st in pending:
                P = len(r.fill_ids) - 1  # feature pairs total
                c = st.confirmed
                n = P - c
                if not group and n > max_tokens:
                    group.append((gi, r, st, c, c + max_tokens))
                    break
                if tok_sum + n > max_tokens or len(group) >= max_rows:
                    break
                group.append((gi, r, st, c, P))
                tok_sum += n
            self._catchup_group(group, drafts, feats_last)

        # ---- (c) k-1 chained draft decode steps ----
        pmax = self.max_pages_per_req
        bb = pad_to_bucket(b, [max_rows])
        page_table = np.zeros((bb, pmax), dtype=np.int32)
        for i, (_, st) in enumerate(active):
            page_table[i, : len(st.pages)] = st.pages
        dec = self._decode_fn(bb)
        for j in range(k - 1):
            ids = np.zeros(bb, dtype=np.int32)
            pos = np.zeros(bb, dtype=np.int32)
            loc = np.zeros(bb, dtype=np.int32)
            sl = np.zeros(bb, dtype=np.int32)
            for i, (r, st) in enumerate(active):
                p = st.confirmed + j
                ids[i] = drafts[i][-1]
                pos[i] = p
                loc[i] = self._slot(st, p)
                sl[i] = p + 1
            fb = make_decode_batch(ids, pos, loc, page_table, sl)
            feats = np.zeros((bb, self.cfg.hidden_size), dtype=np.float32)
            feats[:b] = feats_last
            out, h, self.kv_layers = dec(
                self.params,
                self.t_runner._params(),
                self.kv_layers,
                fb,
                jnp.asarray(feats, dtype=self.cfg.dtype),
            )
            out = np.asarray(out)[:b]
            feats_last = np.asarray(h, dtype=np.float32)[:b]
            for i in range(b):
                drafts[i].append(int(out[i]))

        by_rid = {r.rid: d for (r, _), d in zip(active, drafts)}
        return [by_rid.get(r.rid, []) for r in reqs]

    def _catchup_group(self, group, drafts, feats_last, topk=None, topk_out=None) -> None:
        """Target features for pairs [c, P) of each request in `group`,
        then one ragged draft extend over those pairs; fills drafts[gi][0]
        (= d1) and feats_last[gi]."""
        # target features for positions [c, P): captured verify features
        # when available, one recompute forward for the rest (typically
        # only the first round's prompt positions)
        gb = len(group)
        need = [
            any(p not in st.feats for p in range(c, P))
            for (_, _, st, c, P) in group
        ]
        if any(need):
            t_ids: List[int] = []
            t_pos: List[int] = []
            t_loc: List[int] = []
            nb = sum(need)
            t_seq = np.zeros(nb, dtype=np.int32)
            t_ext = np.zeros(nb, dtype=np.int32)
            pmax = self.t_runner.max_pages_per_req
            t_pt = np.zeros((nb, pmax), dtype=np.int32)
            jj = 0
            for (gi, r, st, c, P), n_ in zip(group, need):
                if not n_:
                    continue
                fill = r.fill_ids
                t_ids.extend(fill[c:P])
                t_pos.extend(range(c, P))
                t_loc.extend(self._target_slot(r, p) for p in range(c, P))
                t_seq[jj] = P
                t_ext[jj] = P - c
                t_pt[jj, : len(r.pages)] = r.pages
                jj += 1
            rec = self.t_runner.forward_extend_hidden(
                np.asarray(t_ids, dtype=np.int32),
                np.asarray(t_pos, dtype=np.int32),
                np.asarray(t_loc, dtype=np.int32),
                t_pt,
                t_seq,
                t_ext,
            )
            off_r = 0
            for (gi, r, st, c, P), n_ in zip(group, need):
                if not n_:
                    continue
                for j, p in enumerate(range(c, P)):
                    st.feats[p] = rec[off_r + j]
                off_r += P - c
        hidden = np.concatenate(
            [
                np.stack([st.feats[p] for p in range(c, P)], axis=0)
                for (gi, r, st, c, P) in group
            ],
            axis=0,
        )  # [sum(P-c), H] — feature f_i per pair position i

        # draft extend over pairs i in [c, P): input token fill[i+1], feature f_i
        d_ids: List[int] = []
        d_pos: List[int] = []
        d_loc: List[int] = []
        feats: List[np.ndarray] = []
        d_seq = np.zeros(gb, dtype=np.int32)
        d_ext = np.zeros(gb, dtype=np.int32)
        d_pt = np.zeros((gb, self.max_pages_per_req), dtype=np.int32)
        off = 0
        for j, (gi, r, st, c, P) in enumerate(group):
            fill = r.fill_ids
            n = P - c
            d_ids.extend(fill[c + 1 : P + 1])
            d_pos.extend(range(c, P))
            d_loc.extend(self._slot(st, p) for p in range(c, P))
            feats.append(hidden[off : off + n])
            off += n
            d_seq[j] = P
            d_ext[j] = n
            d_pt[j, : len(st.pages)] = st.pages

        t = len(d_ids)
        tt = pad_to_bucket(t, self.t_runner.prefill_token_buckets)
        bb = pad_to_bucket(gb, [self.t_runner.extend_seq_bucket])
        cu = np.zeros(bb + 1, dtype=np.int32)
        cu[1 : gb + 1] = np.cumsum(d_ext)
        cu[gb + 1 :] = cu[gb]
        feats_arr = np.zeros((tt, self.feat_dim), dtype=np.float32)
        feats_arr[:t] = np.concatenate(feats, axis=0)
        fb = make_extend_batch(
            _pad(np.asarray(d_ids, dtype=np.int32), tt),
            _pad(np.asarray(d_pos, dtype=np.int32), tt),
            _pad(np.asarray(d_loc, dtype=np.int32), tt),
            _pad2(d_pt, bb, self.max_pages_per_req),
            _pad(d_seq, bb),
            cu,
        )
        last_idx = np.maximum(cu[1 : bb + 1] - 1, 0)
        if topk is not None:
            ext = self._extend_topk_fn(tt, bb, topk)
        else:
            ext = self._extend_fn(tt, bb)
        d1, h_last, self.kv_layers = ext(
            self.params,
            self.t_runner._params(),
            self.kv_layers,
            fb,
            jnp.asarray(feats_arr, dtype=self.cfg.dtype),
            jnp.asarray(last_idx),
        )
        d1 = np.asarray(d1)
        h_last = np.asarray(h_last, dtype=np.float32)
        for j, (gi, r, st, c, P) in enumerate(group):
            if topk is not None:
                topk_out[gi] = list(d1[j])
                drafts[gi] = [int(d1[j][0])]
            else:
                drafts[gi] = [int(d1[j])]
            feats_last[gi] = h_last[j]
            st.confirmed = P
            # features below `confirmed` can never be needed again
            st.feats = {p: v for p, v in st.feats.items() if p >= P}


def _pad(arr: np.ndarray, n: int, fill=0) -> np.ndarray:
    arr = np.asarray(arr)
    if len(arr) >= n:
        return arr[:n]
    out = np.full(n, fill, dtype=arr.dtype)
    out[: len(arr)] = arr
    return out


def _pad2(arr: np.ndarray, rows: int, cols: int) -> np.ndarray:
    out = np.zeros((rows, cols), dtype=np.int32)
    r = min(rows, arr.shape[0])
    c = min(cols, arr.shape[1])
    out[:r, :c] = arr[:r, :c]
    return out
