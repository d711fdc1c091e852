"""KV-cache pools.

Parity with reference `srt/mem_cache/memory_pool.py`:
- `ReqToTokenPool:128` (per-request page table)  -> `ReqToPagePool` here
  (page-granular: each request slot holds its ordered page-id list, mirrored
  into a numpy matrix for O(1) device batch assembly).
- `MHATokenToKVPool:789` (per-layer K/V HBM buffers) -> `KVCachePool` here:
  one fused array per layer `[num_pages, page_size, 2*kv_heads, head_dim]`
  living on device, threaded through the jitted step with buffer donation
  (in-place scatter). FP8 KV stores fp8_e4m3 values (reference stores uint8,
  `memory_pool.py:710`); TPU XLA has a native fp8 dtype so no bit-packing.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)

KV_DTYPE_MAP = {
    "auto": None,  # model dtype
    "bfloat16": jnp.bfloat16,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
    # TPU-native KV compression: int8 values + per-(token, head) f32
    # scales in a sibling array. Mosaic's int8->bf16 convert is the one
    # fast 8-bit upcast (float8 converts measured 4-19x slower in-kernel),
    # and per-token scaling beats e4m3 accuracy (~0.4% vs ~6% rel err).
    "int8": jnp.int8,
    # int4 KV: two values per byte packed along head_dim (byte j holds
    # dims (j, j + d/2): low nibble -> j, high nibble -> j + d/2, so the
    # kernel unpacks with one lane-concat instead of an interleave),
    # same per-(token, head) f32 scale plane as int8 with range +-7.
    # Halves decode's KV-bandwidth wall again vs int8.
    "int4": jnp.uint8,
}


class ReqToPagePool:
    """Request slot -> ordered page ids (the per-request page table)."""

    def __init__(self, size: int, max_pages_per_req: int):
        self.size = size
        self.max_pages_per_req = max_pages_per_req
        self.page_table = np.zeros((size, max_pages_per_req), dtype=np.int32)
        self.page_counts = np.zeros(size, dtype=np.int32)
        self._free_slots: List[int] = list(range(size - 1, -1, -1))

    def alloc(self) -> Optional[int]:
        if not self._free_slots:
            return None
        return self._free_slots.pop()

    def free(self, slot: int) -> None:
        self.page_table[slot, : self.page_counts[slot]] = 0
        self.page_counts[slot] = 0
        self._free_slots.append(slot)

    def available_size(self) -> int:
        return len(self._free_slots)

    def set_pages(self, slot: int, pages: List[int]) -> None:
        n = len(pages)
        assert n <= self.max_pages_per_req
        self.page_table[slot, :n] = pages
        self.page_table[slot, n:] = 0
        self.page_counts[slot] = n

    def append_pages(self, slot: int, pages: List[int]) -> None:
        n = self.page_counts[slot]
        self.page_table[slot, n : n + len(pages)] = pages
        self.page_counts[slot] = n + len(pages)

    def get_pages(self, slot: int) -> np.ndarray:
        return self.page_table[slot, : self.page_counts[slot]]


class KVCachePool:
    """Device-side paged KV buffers, one per layer.

    The arrays are *owned* by the ModelRunner step loop: each jitted forward
    donates them and returns the updated arrays, so XLA updates in place.
    """

    def __init__(
        self,
        num_pages: int,
        page_size: int,
        num_layers: int,
        num_kv_heads: int,
        head_dim: int,
        dtype,
        kv_cache_dtype: str = "auto",
        sharding: Optional[jax.sharding.NamedSharding] = None,
        stacked_sharding: Optional[jax.sharding.NamedSharding] = None,
        fused: bool = False,
    ):
        self.num_pages = num_pages
        self.page_size = page_size
        self.num_layers = num_layers
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        self.store_dtype = KV_DTYPE_MAP[kv_cache_dtype] or dtype
        self.kv_cache_dtype = kv_cache_dtype
        self.sharding = sharding
        # head-major page layout [P, 2*kvh, ps, d]: per-head K/V planes are
        # contiguous (ps, d) blocks, so Pallas kernels DMA a page into a
        # head-major VMEM scratch and slice heads on the FREE outer dim
        # (token-major [P, ps, 2*kvh, d] forced a sublane-gather relayout
        # per head per KV chunk — measured 2.3-2.8x slower decode attention)
        # int4 KV nibble-pairs the K and V planes of each head into one
        # byte row (full 128-lane head_dim; Mosaic rejects 64-lane HBM
        # slices), so the heads axis is kvh instead of 2*kvh
        self.packed_int4 = kv_cache_dtype == "int4"
        heads_axis = num_kv_heads if self.packed_int4 else 2 * num_kv_heads
        shape = (num_pages, heads_axis, page_size, head_dim)
        # int8/int4 KV: each layer is a (values, scales) tuple — the
        # kv_layer travels opaquely through model code, so downstream only
        # the write path and the attention kernels unpack it
        self.has_scales = kv_cache_dtype in ("int8", "int4")
        # per-page scale plane [rows, 128] f32, one row per (K or V) head,
        # token offsets on lanes 0..ps-1 (needs ps <= 128; rows padded to a
        # multiple of 8 so a page's plane DMAs as whole (8, 128) tiles — a
        # flat [P, blob] 2-D layout fails on hardware). Row-per-head keeps
        # kernel indexing static (`sc[p, head, :ps]`), lets the Pallas
        # write kernel merge with one lane mask, and makes the plane
        # shardable by KV head for tp>1.
        if self.has_scales:
            assert page_size <= 128, "int8 KV needs page_size <= 128"
        self.scale_rows = scale_plane_rows(num_kv_heads)
        self.scale_blob = self.scale_rows * 128
        scale_shape = (num_pages, self.scale_rows, 128)

        def _make_layer():
            vals = jnp.zeros(shape, dtype=self.store_dtype)
            if self.has_scales:
                return (vals, jnp.zeros(scale_shape, dtype=jnp.float32))
            return vals

        def _make():
            return [_make_layer() for _ in range(num_layers)]

        self.stacked = None
        self.fused = None
        if fused:
            # layer-fused pool for the scanned forward: ONE array
            # [L * P, 2kvh, ps, d] where layer i's pages live at rows
            # [i*P, (i+1)*P) — layer selection is page-id arithmetic, so
            # the lax.scan over layers never slices whole layer planes
            # (see model_executor/scan_forward.py)
            fshape = (num_layers * num_pages,) + shape[1:]
            vals = jnp.zeros(fshape, dtype=self.store_dtype)
            if sharding is not None:
                vals = jax.device_put(vals, sharding)
            if self.has_scales:
                sc = jnp.zeros(
                    (num_layers * num_pages,) + scale_shape[1:],
                    dtype=jnp.float32,
                )
                if sharding is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    sc = jax.device_put(
                        sc,
                        NamedSharding(
                            sharding.mesh,
                            PartitionSpec(sharding.spec[0], None, None),
                        ),
                    )
                self.fused = (vals, sc)
            else:
                self.fused = vals
            self.layers = None
            nbytes = sum(x.nbytes for x in jax.tree.leaves(self.fused))
        elif stacked_sharding is not None:
            # PP mode: one [L, P, 2kvh, ps, d] array, layer axis sharded
            # over "pipe" — each stage owns its layers' planes for every
            # page, so the (global-page-id) allocator is stage-agnostic
            assert not self.has_scales, "int8 KV not supported with pp_size>1"
            self.stacked = jax.device_put(
                jnp.zeros((num_layers,) + shape, dtype=self.store_dtype),
                stacked_sharding,
            )
            self.layers = None
            nbytes = self.stacked.nbytes
        elif sharding is not None:
            scale_sharding = None
            if self.has_scales:
                from jax.sharding import NamedSharding, PartitionSpec

                # pages dim follows the values pool; the flat head-major
                # scale plane cannot shard by head (int8 KV + tp>1 is
                # rejected at runner init)
                scale_sharding = NamedSharding(
                    sharding.mesh, PartitionSpec(sharding.spec[0], None, None)
                )

            def _place(layer):
                if self.has_scales:
                    return (
                        jax.device_put(layer[0], sharding),
                        jax.device_put(layer[1], scale_sharding),
                    )
                return jax.device_put(layer, sharding)

            self.layers = [_place(_make_layer()) for _ in range(num_layers)]
            nbytes = sum(
                x.nbytes for l in self.layers for x in jax.tree.leaves(l)
            )
        else:
            self.layers = _make()
            nbytes = sum(
                x.nbytes for l in self.layers for x in jax.tree.leaves(l)
            )
        logger.info(
            "KV pool: %d pages x %d tokens, %d layers, %s, %.2f GiB",
            num_pages,
            page_size,
            num_layers,
            self.store_dtype.__name__ if hasattr(self.store_dtype, "__name__") else self.store_dtype,
            nbytes / (1 << 30),
        )

    @property
    def capacity_tokens(self) -> int:
        return (self.num_pages - 1) * self.page_size

    def layer_view(self, i: int):
        """Layer i's page array(s), in any storage mode (list / fused /
        pp-stacked) — introspection helper for tests and debugging."""
        if self.layers is not None:
            return self.layers[i]
        if self.fused is not None:
            lo, hi = i * self.num_pages, (i + 1) * self.num_pages
            if self.has_scales:
                v, s = self.fused
                return (v[lo:hi], s[lo:hi])
            return self.fused[lo:hi]
        return self.stacked[i]

    def bytes_per_page(self) -> int:
        if self.layers is None:
            src = self.fused if self.fused is not None else self.stacked
            total = sum(x.nbytes for x in jax.tree.leaves(src))
            return total // self.num_pages
        per_layer = sum(x.nbytes for x in jax.tree.leaves(self.layers[0]))
        return per_layer // self.num_pages * self.num_layers


def scale_plane_rows(num_kv_heads: int) -> int:
    """Row count of the int8-KV per-page scale plane [rows, 128] f32: one
    row per K head then per V head, padded to a multiple of 8 so a single
    page's plane DMAs as whole (8, 128) tiles."""
    return -(-(2 * num_kv_heads) // 8) * 8


def compute_num_pages(
    available_bytes: int,
    page_size: int,
    num_layers: int,
    num_kv_heads: int,
    head_dim: int,
    store_dtype,
    max_total_tokens: Optional[int] = None,
    extra_bytes_per_page_layer: int = 0,
) -> int:
    """Size the pool from an HBM byte budget (reference
    `model_runner_kv_cache_mixin` profile-run equivalent, computed
    analytically from the device memory stats). `extra_bytes_per_page_layer`
    covers sibling per-page planes (e.g. the NSA index-key plane)."""
    elem = jnp.dtype(store_dtype).itemsize
    bytes_per_page = (
        page_size * 2 * num_kv_heads * head_dim * elem + extra_bytes_per_page_layer
    ) * num_layers
    if store_dtype == jnp.int8:
        # per-(token, head) f32 scale plane, tile-padded
        bytes_per_page += scale_plane_rows(num_kv_heads) * 512 * num_layers
    num_pages = max(2, available_bytes // bytes_per_page)
    if max_total_tokens is not None:
        num_pages = min(num_pages, cdiv(max_total_tokens, page_size) + 1)
    return int(num_pages)
