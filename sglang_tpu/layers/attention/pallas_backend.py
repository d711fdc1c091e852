"""Pallas TPU attention backend over the paged KV pool.

Role parity with reference `layers/attention/flashinfer_backend.py` (the
default production backend on NVIDIA) — here one unified ragged-paged-
attention Pallas kernel serves both extend and decode
(`ops/ragged_paged_attention.py`).
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_tpu.layers.attention.base import AttentionBackend
from sglang_tpu.model_executor.forward_batch_info import (
    DECODE_QBLK,
    EXTEND_QBLK,
    ForwardBatch,
)
from sglang_tpu.ops.paged_decode_attention import paged_decode_attention
from sglang_tpu.ops.ragged_paged_attention import ragged_paged_attention


class PallasAttentionBackend(AttentionBackend):
    def __init__(self, interpret: bool = False):
        # interpret=True runs the kernel in the Pallas interpreter (CPU CI —
        # the reference's "CPU suite runs the whole engine" seam).
        self.interpret = interpret
        self._fallback = None

    def _tileable(self, q) -> bool:
        """Hardware DMA tiling needs a 128-multiple head dim; smaller
        geometries (tiny draft/test models) route to the jnp reference
        backend instead of failing Mosaic compilation. Interpreter mode
        has no tiling constraint."""
        return self.interpret or q.shape[-1] % 128 == 0

    def _ref(self):
        if self._fallback is None:
            from sglang_tpu.layers.attention.reference_backend import (
                ReferenceAttentionBackend,
            )

            self._fallback = ReferenceAttentionBackend()
        return self._fallback

    def _attend(
        self, q, pages, fb: ForwardBatch, qblk, sm_scale, window, logit_cap,
        sinks=None,
    ):
        t = q.shape[0]
        q_pad = jnp.pad(q, ((0, qblk), (0, 0), (0, 0)))
        out = ragged_paged_attention(
            q_pad,
            pages,
            fb.blk_seq,
            fb.blk_qoff,
            fb.blk_nrows,
            fb.blk_pos0,
            fb.page_table,
            qblk=qblk,
            sm_scale=float(sm_scale),
            logit_cap=float(logit_cap),
            window=int(window),
            interpret=self.interpret,
            sinks=sinks,
        )
        return out[:t]

    def forward_decode(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0, sinks=None,
    ):
        # decode-specialized kernel: 8 rows per grid block with a global
        # (row, chunk) DMA stream — 2.3-2.8x the unified kernel's decode
        # bandwidth (scripts/bench_decode_kernel.py)
        import os

        if not self._tileable(q):
            return self._ref().forward_decode(
                q, pages, fb, sm_scale, sliding_window=sliding_window,
                logit_cap=logit_cap, sinks=sinks,
            )
        if os.environ.get("SGLANG_TPU_DECODE_KERNEL") == "unified":
            return self._attend(
                q, pages, fb, DECODE_QBLK, sm_scale, sliding_window,
                logit_cap, sinks=sinks,
            )
        b = q.shape[0]
        pad = (-b) % 8
        q_pad = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        sl = jnp.pad(fb.seq_lens, (0, pad))
        pt = jnp.pad(fb.page_table, ((0, pad), (0, 0)))
        out = paged_decode_attention(
            q_pad,
            pages,
            sl,
            pt,
            sm_scale=float(sm_scale),
            logit_cap=float(logit_cap),
            window=int(sliding_window),
            interpret=self.interpret,
            sinks=sinks,
        )
        return out[:b]

    def forward_decode_state(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0,
    ):
        if not self._tileable(q):
            return self._ref().forward_decode_state(
                q, pages, fb, sm_scale, sliding_window=sliding_window,
                logit_cap=logit_cap,
            )
        b = q.shape[0]
        pad = (-b) % 8
        q_pad = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        sl = jnp.pad(fb.seq_lens, (0, pad))
        pt = jnp.pad(fb.page_table, ((0, pad), (0, 0)))
        out, st = paged_decode_attention(
            q_pad,
            pages,
            sl,
            pt,
            sm_scale=float(sm_scale),
            logit_cap=float(logit_cap),
            window=int(sliding_window),
            interpret=self.interpret,
            return_state=True,
        )
        return out[:b], st[:b, :, 0], st[:b, :, 1]

    def forward_extend(
        self, q, pages, fb: ForwardBatch, sm_scale, sliding_window=-1,
        logit_cap=0.0, sinks=None,
    ):
        from sglang_tpu.model_executor.forward_batch_info import ForwardMode

        if not self._tileable(q):
            return self._ref().forward_extend(
                q, pages, fb, sm_scale, sliding_window=sliding_window,
                logit_cap=logit_cap, sinks=sinks,
            )
        qblk = DECODE_QBLK if fb.mode == ForwardMode.TARGET_VERIFY else EXTEND_QBLK
        return self._attend(
            q, pages, fb, qblk, sm_scale, sliding_window, logit_cap,
            sinks=sinks,
        )
