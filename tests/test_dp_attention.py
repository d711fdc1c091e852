"""DP-attention composition (reference --enable-dp-attention, the
DeepSeek serving layout): requests are sharded over the mesh axis, every
rank runs ATTENTION purely locally on its own requests (KV never crosses
ranks — MLA's single-head KV makes TP-sharding it useless), and the MoE
runs over the UNION of all ranks' tokens through the EP all-to-all
dispatch. Composed here from `parallel/ep.py` + local attention inside
one shard_map; must equal the unsharded model exactly."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.layers.activation import silu_and_mul
from sglang_tpu.layers.moe import fused_moe
from sglang_tpu.parallel.ep import ep_moe_local


def _causal_attn(x, wq, wk, wv, L):
    """[B*L, H] tokens -> causal self-attention within each length-L seq."""
    t, h = x.shape
    b = t // L
    q = (x @ wq).reshape(b, L, h)
    k = (x @ wk).reshape(b, L, h)
    v = (x @ wv).reshape(b, L, h)
    s = jnp.einsum("bqh,bkh->bqk", q, k) / math.sqrt(h)
    mask = jnp.tril(jnp.ones((L, L), bool))
    s = jnp.where(mask[None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkh->bqh", p, v).reshape(t, h)


def test_dp_attention_plus_ep_moe_matches_unsharded():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    dp = 4
    mesh = Mesh(np.array(devs[:dp]), ("dp",))
    rng = np.random.default_rng(0)
    B, L, H, M, E, K = 8, 8, 16, 8, 8, 2  # 2 seqs per rank
    x = rng.standard_normal((B * L, H)).astype(np.float32) * 0.3
    wq, wk, wv = (rng.standard_normal((H, H)).astype(np.float32) * 0.2
                  for _ in range(3))
    router = rng.standard_normal((H, E)).astype(np.float32)
    w1 = rng.standard_normal((E, H, 2 * M)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((E, M, H)).astype(np.float32) * 0.1

    # unsharded reference: attention per sequence, MoE over all tokens
    a_ref = _causal_attn(jnp.asarray(x), wq, wk, wv, L)
    ref = a_ref + fused_moe(
        a_ref, jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        top_k=K, norm_topk_prob=True,
    )

    t_local = B * L // dp

    def block(xl, wq, wk, wv, router, w1_l, w2_l):
        # attention: LOCAL to this rank's own sequences — zero collectives
        a = _causal_attn(xl, wq, wk, wv, L)
        # MoE: union of all ranks' tokens through the EP all-to-all
        moe = ep_moe_local(
            a, router, w1_l, w2_l,
            axis="dp", top_k=K, capacity=t_local * K, norm_topk_prob=True,
        )
        return a + moe

    fn = jax.jit(
        jax.shard_map(
            block,
            mesh=mesh,
            in_specs=(
                P("dp", None), P(None, None), P(None, None), P(None, None),
                P(None, None), P("dp", None, None), P("dp", None, None),
            ),
            out_specs=P("dp", None),
            check_vma=False,
        )
    )
    out = fn(
        jax.device_put(x, NamedSharding(mesh, P("dp", None))),
        jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv),
        jnp.asarray(router),
        jax.device_put(w1, NamedSharding(mesh, P("dp", None, None))),
        jax.device_put(w2, NamedSharding(mesh, P("dp", None, None))),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
