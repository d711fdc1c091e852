"""Chunked-parallel SSD prefill vs the sequential token-scan reference
(`mamba2_extend`): outputs and both state pools must match exactly on
packed ragged streams with fresh + continuing sequences, segment spans
crossing chunk boundaries, and bucket padding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from sglang_tpu.layers.linear_attn import mamba2_extend
from sglang_tpu.layers.mamba2_chunked import mamba2_extend_chunked

GEOM = (4, 8, 2, 16)  # nh, dh, g, ds
K = 4  # conv kernel


def _params(rng):
    nh, dh, g, ds = GEOM
    conv_dim = nh * dh + 2 * g * ds
    return dict(
        conv_w=jnp.asarray(rng.standard_normal((conv_dim, K)) * 0.3, jnp.float32),
        conv_b=jnp.asarray(rng.standard_normal(conv_dim) * 0.1, jnp.float32),
        a_log=jnp.asarray(rng.standard_normal(nh) * 0.3, jnp.float32),
        dt_bias=jnp.asarray(rng.standard_normal(nh) * 0.2, jnp.float32),
        d_skip=jnp.asarray(rng.standard_normal(nh) * 0.5, jnp.float32),
    )


def _pools(rng, S):
    nh, dh, g, ds = GEOM
    conv_dim = nh * dh + 2 * g * ds
    conv = jnp.asarray(
        rng.standard_normal((S + 1, conv_dim, K - 1)) * 0.3, jnp.float32
    )
    ssm = jnp.asarray(
        rng.standard_normal((S + 1, nh, dh, ds)) * 0.3, jnp.float32
    )
    return conv, ssm


def _stream(rng, spans, T_pad=0):
    """spans: list of (slot, start_pos, length). Returns packed arrays
    (padding tokens appended with the sentinel slot)."""
    nh, dh, g, ds = GEOM
    conv_dim = nh * dh + 2 * g * ds
    slots, positions = [], []
    for slot, p0, n in spans:
        slots += [slot] * n
        positions += list(range(p0, p0 + n))
    S = max(s for s, _, _ in spans) + 3
    slots += [S] * T_pad
    positions += [0] * T_pad
    T = len(slots)
    xbc = jnp.asarray(rng.standard_normal((T, conv_dim)) * 0.5, jnp.float32)
    dt = jnp.asarray(rng.standard_normal((T, nh)) * 0.5, jnp.float32)
    return (
        xbc,
        dt,
        jnp.asarray(slots, jnp.int32),
        jnp.asarray(positions, jnp.int32),
        S,
    )


def _compare(spans, T_pad=0, chunk=8, seed=0):
    rng = np.random.default_rng(seed)
    p = _params(rng)
    xbc, dt, slots, positions, S = _stream(rng, spans, T_pad)
    conv0, ssm0 = _pools(rng, S)
    args = (xbc, dt, slots, positions, GEOM, p["conv_w"], p["conv_b"],
            p["a_log"], p["dt_bias"], p["d_skip"], (0.001, 10.0))
    y_ref, conv_ref, ssm_ref = mamba2_extend(conv0, ssm0, *args)
    y, conv, ssm = mamba2_extend_chunked(
        conv0, ssm0, *args, chunk=chunk, max_seqs=8
    )
    # outputs: compare only REAL tokens (padding rows are ignored by the
    # model; the sequential path computes garbage for them too)
    real = np.asarray(slots) != S
    np.testing.assert_allclose(
        np.asarray(y)[real], np.asarray(y_ref)[real], atol=2e-4, rtol=2e-4
    )
    # pools: compare only rows owned by real sequences (the sentinel
    # trash row differs by design)
    rows = sorted({s for s, _, _ in spans})
    np.testing.assert_allclose(
        np.asarray(conv)[rows], np.asarray(conv_ref)[rows],
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ssm)[rows], np.asarray(ssm_ref)[rows],
        atol=2e-4, rtol=2e-4,
    )


def test_single_fresh_sequence():
    _compare([(0, 0, 23)], chunk=8, seed=1)


def test_fresh_sequence_exact_chunk_multiple():
    _compare([(1, 0, 32)], chunk=8, seed=2)


def test_multiple_fresh_sequences_crossing_chunks():
    # spans of 5/13/9 tokens with chunk 8: boundaries mid-chunk and
    # segments spanning chunk borders
    _compare([(0, 0, 5), (1, 0, 13), (2, 0, 9)], chunk=8, seed=3)


def test_continuing_sequences_read_and_advance_pool_state():
    # all sequences continue (chunked prefill): initial conv window and
    # SSM state come from the pools
    _compare([(0, 7, 11), (1, 40, 6)], chunk=8, seed=4)


def test_mixed_fresh_and_continuing_with_padding():
    _compare(
        [(3, 0, 9), (0, 21, 14), (2, 0, 3), (1, 5, 12)],
        T_pad=10, chunk=8, seed=5,
    )


def test_short_sequences_and_conv_tail_shorter_than_kernel():
    # 1- and 2-token sequences: the written conv window must mix pool
    # context (continuing) or zeros (fresh) with the new tokens
    _compare([(0, 0, 1), (1, 9, 2), (2, 0, 2), (3, 3, 1)], chunk=4, seed=6)


def test_chunk_size_larger_than_stream():
    _compare([(0, 0, 5), (1, 0, 4)], chunk=64, seed=7)


def test_long_stream_chunk64():
    _compare([(0, 0, 150), (1, 30, 90), (2, 0, 60)], T_pad=20,
             chunk=64, seed=8)
