"""NSA (DeepSeek V3.2 sparse attention) tests.

Reference parity targets: `srt/layers/attention/nsa/nsa_indexer.py` (the
lightning indexer), `srt/layers/attention/nsa_backend.py` (sparse attention
over selected tokens), `srt/mem_cache/memory_pool.py:1981 NSATokenToKVPool`
(the index-key plane). Equivalence law under test: with
`index_topk >= context`, NSA selection covers every causal position, so the
engine must match HF transformers token-for-token; with a small topk the
selection must equal a numpy top-k oracle.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _sparse_vs_dense_mqa(seed, topk, seqs):
    """nsa sparse attention == dense MQA oracle when topk >= max seq len.

    On hardware the MXU contracts f32 operands at bf16 input precision, so
    the device scores/logits deviate from the numpy oracle by ~1e-2
    relative on these tiny dims — the device bound reflects that; CPU
    stays at 1e-4."""
    import os

    import jax.numpy as jnp

    atol = 1e-2 if os.environ.get("SGLANG_TPU_TEST_DEVICE") == "tpu" else 1e-4

    from sglang_tpu.layers.attention.nsa import (
        indexer_scores,
        sparse_mqa_attention,
        topk_positions,
        write_index_k,
    )

    rng = np.random.default_rng(seed)
    ps, pmax, d, di, h, hi = 4, 6, 16, 8, 2, 3
    num_pages = 1 + pmax * len(seqs)
    pages = jnp.zeros((num_pages, 2, ps, d), jnp.float32)
    idx_pages = jnp.zeros((num_pages, ps, di), jnp.float32)
    page_table = np.zeros((len(seqs), pmax), dtype=np.int32)
    locs, k_rows, ki_rows = [], [], []
    next_page = 1
    for b, sl in enumerate(seqs):
        n_p = -(-sl // ps)
        pgs = list(range(next_page, next_page + n_p))
        next_page += n_p
        page_table[b, :n_p] = pgs
        for p in range(sl):
            locs.append(pgs[p // ps] * ps + p % ps)
            k_rows.append(rng.normal(size=d))
            ki_rows.append(rng.normal(size=di))
    locs = np.asarray(locs, dtype=np.int32)
    k_all = np.asarray(k_rows, dtype=np.float32)
    ki_all = np.asarray(ki_rows, dtype=np.float32)
    from sglang_tpu.layers.attention.base import write_kv_pages

    pages = write_kv_pages(
        pages, jnp.asarray(k_all)[:, None, :], jnp.asarray(k_all)[:, None, :],
        jnp.asarray(locs),
    )
    idx_pages = write_index_k(idx_pages, jnp.asarray(ki_all), jnp.asarray(locs))

    # decode-style query per sequence
    q = rng.normal(size=(len(seqs), h, d)).astype(np.float32)
    q_idx = rng.normal(size=(len(seqs), hi, di)).astype(np.float32)
    gate = rng.normal(size=(len(seqs), hi)).astype(np.float32)
    seq_lens = np.asarray(seqs, dtype=np.int32)

    scores = indexer_scores(
        jnp.asarray(q_idx), jnp.asarray(gate), idx_pages,
        jnp.asarray(page_table),
    )
    top_pos, top_valid = topk_positions(jnp.asarray(scores), jnp.asarray(seq_lens), topk)
    out = sparse_mqa_attention(
        jnp.asarray(q), pages, jnp.asarray(page_table), top_pos, top_valid,
        sm_scale=d**-0.5,
    )

    # numpy oracle: per sequence, indexer score -> top-k -> masked softmax.
    # relu can zero several positions' scores, so selection ties are
    # possible: verify the selected score MULTISET against the numpy top-k,
    # then the attention output over the positions jax actually selected.
    top_pos_np = np.asarray(top_pos)
    top_valid_np = np.asarray(top_valid)
    off = 0
    for b, sl in enumerate(seqs):
        keys = k_all[off : off + sl]
        ikeys = ki_all[off : off + sl]
        off += sl
        sc = (gate[b][:, None] * np.maximum(q_idx[b] @ ikeys.T, 0.0)).sum(0)
        k_eff = min(topk, sl)
        sel = top_pos_np[b][top_valid_np[b]]
        assert len(sel) == k_eff
        np.testing.assert_allclose(
            np.sort(sc[sel]), np.sort(sc)[sl - k_eff :], atol=atol
        )
        logits = (q[b] @ keys[sel].T) * d**-0.5
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = p @ keys[sel]
        np.testing.assert_allclose(np.asarray(out)[b], want, atol=atol)


def test_sparse_equals_dense_when_topk_covers():
    _sparse_vs_dense_mqa(seed=0, topk=64, seqs=[5, 9, 3])


def test_topk_selection_matches_oracle():
    _sparse_vs_dense_mqa(seed=1, topk=4, seqs=[7, 11, 2])


def _make_v32_checkpoint(path, index_topk, seed=7):
    """Save a tiny V3-shaped HF checkpoint, then graft indexer tensors +
    NSA config keys onto it (no public DeepseekV32 class in transformers)."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    cfg = DeepseekV3Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        n_group=2, topk_group=1,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(seed)
    hf = DeepseekV3ForCausalLM(cfg).eval()
    hf.save_pretrained(str(path))

    import safetensors.numpy

    st_path = os.path.join(str(path), "model.safetensors")
    tensors = dict(safetensors.numpy.load_file(st_path))
    rng = np.random.default_rng(seed)
    hi, di, h, ql = 3, 16, 64, 48
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}.self_attn.indexer"
        tensors[f"{p}.wq_b.weight"] = (
            rng.normal(size=(hi * di, ql)).astype(np.float32) * 0.1
        )
        tensors[f"{p}.wk.weight"] = (
            rng.normal(size=(di, h)).astype(np.float32) * 0.1
        )
        tensors[f"{p}.weights_proj.weight"] = (
            rng.normal(size=(hi, h)).astype(np.float32) * 0.1
        )
        tensors[f"{p}.k_norm.weight"] = np.ones(di, dtype=np.float32)
        tensors[f"{p}.k_norm.bias"] = np.zeros(di, dtype=np.float32)
    safetensors.numpy.save_file(tensors, st_path)

    cfg_path = os.path.join(str(path), "config.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    raw["index_topk"] = index_topk
    raw["index_n_heads"] = hi
    raw["index_head_dim"] = di
    raw["indexer_rope_interleave"] = True
    with open(cfg_path, "w") as f:
        json.dump(raw, f)
    return hf


def _engine_for(path):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.server_args import ServerArgs

    return Engine(
        ServerArgs(
            model_path=str(path), dtype="float32", device="cpu", page_size=16,
            context_length=256, max_total_tokens=2048,
            prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
            max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
            log_level="warning",
        )
    )


def test_nsa_engine_matches_hf_when_topk_covers(tmp_path_factory):
    """index_topk >= context: NSA selection is exhaustive, so greedy
    generation must equal HF (which has no indexer — with full coverage the
    indexer only orders, never drops)."""
    path = tmp_path_factory.mktemp("tiny_v32_full")
    hf = _make_v32_checkpoint(path, index_topk=256)
    eng = _engine_for(path)
    assert eng.scheduler.runner.model.use_nsa
    prompt = [int(x) for x in np.random.default_rng(3).integers(3, 200, size=9)]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0].tolist()
    assert out["output_ids"] == ref[len(prompt):]
    eng.shutdown()


def test_nsa_engine_sparse_topk_serves(tmp_path_factory):
    """Small topk (< prompt length): the engine serves deterministically
    through prefill + multi-step decode + radix-cached second turn."""
    path = tmp_path_factory.mktemp("tiny_v32_sparse")
    _make_v32_checkpoint(path, index_topk=8)
    eng = _engine_for(path)
    prompt = [int(x) for x in np.random.default_rng(5).integers(3, 200, size=24)]
    sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    out1 = eng.generate(input_ids=prompt, sampling_params=sp)
    out2 = eng.generate(input_ids=prompt, sampling_params=sp)
    assert len(out1["output_ids"]) == 12
    assert out1["output_ids"] == out2["output_ids"]
    # radix prefix reuse on the second call keeps outputs identical
    assert out2["meta_info"]["cached_tokens"] > 0
    eng.shutdown()
