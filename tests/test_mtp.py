"""DeepSeek MTP / NEXTN speculative decoding (reference
`deepseek_nextn.py`): the checkpoint's extra MTP layer drafts tokens;
output must be identical to plain target greedy decoding."""

import json
import os
import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _add_mtp_tensors(path, L=2, h=64, vocab=256, kv_lora=32, q_lora=48,
                     nope=16, rope=8, v=16, nh=4, moe_inter=32, n_exp=4,
                     seed=11):
    """Write a second safetensors shard holding model.layers.{L}.* (the
    MTP head) next to the HF-saved target weights."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)

    def W(*shape, scale=0.05):
        return np.ascontiguousarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        )

    p = f"model.layers.{L}."
    t = {
        p + "embed_tokens.weight": W(vocab, h),
        p + "enorm.weight": np.ones(h, np.float32),
        p + "hnorm.weight": np.ones(h, np.float32),
        p + "eh_proj.weight": W(h, 2 * h),
        p + "shared_head.norm.weight": np.ones(h, np.float32),
        p + "shared_head.head.weight": W(vocab, h),
        p + "input_layernorm.weight": np.ones(h, np.float32),
        p + "post_attention_layernorm.weight": np.ones(h, np.float32),
        p + "self_attn.q_a_proj.weight": W(q_lora, h),
        p + "self_attn.q_a_layernorm.weight": np.ones(q_lora, np.float32),
        p + "self_attn.q_b_proj.weight": W(nh * (nope + rope), q_lora),
        p + "self_attn.kv_a_proj_with_mqa.weight": W(kv_lora + rope, h),
        p + "self_attn.kv_a_layernorm.weight": np.ones(kv_lora, np.float32),
        p + "self_attn.kv_b_proj.weight": W(nh * (nope + v), kv_lora),
        p + "self_attn.o_proj.weight": W(h, nh * v),
        p + "mlp.gate.weight": W(n_exp, h),
        p + "mlp.shared_experts.gate_proj.weight": W(moe_inter, h),
        p + "mlp.shared_experts.up_proj.weight": W(moe_inter, h),
        p + "mlp.shared_experts.down_proj.weight": W(h, moe_inter),
    }
    for j in range(n_exp):
        t[p + f"mlp.experts.{j}.gate_proj.weight"] = W(moe_inter, h)
        t[p + f"mlp.experts.{j}.up_proj.weight"] = W(moe_inter, h)
        t[p + f"mlp.experts.{j}.down_proj.weight"] = W(h, moe_inter)
    save_file(t, os.path.join(path, "mtp.safetensors"))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("mtp_target")
    cfg = DeepseekV2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
        aux_loss_alpha=0.0,
    )
    torch.manual_seed(4)
    DeepseekV2ForCausalLM(cfg).eval().save_pretrained(path)
    _add_mtp_tensors(str(path))
    return str(path)


def _run(path, spec):
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=path, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
        speculative_algorithm="MTP" if spec else None,
        speculative_num_draft_tokens=4,
    )
    sched = Scheduler(sa)
    rng = np.random.default_rng(2)
    rids = []
    for m in (7, 18):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid, input_ids=rng.integers(3, 200, size=m).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=12, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 500
    return [outs[r].output_ids for r in rids], sched


def test_mtp_is_lossless(ckpt):
    base, _ = _run(ckpt, spec=False)
    spec, sched = _run(ckpt, spec=True)
    assert spec == base  # MTP drafts may be useless, never wrong
    assert not sched.draft_worker.states
    assert sched.draft_worker.allocator.check_leaks() == 0
    assert sched.check_memory() == 0


def test_mtp_model_loads_head_weights(ckpt):
    """The MTP module reads the extra layer's tensors (own embed, eh_proj,
    shared head) and its draft KV uses the latent MLA geometry."""
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.speculative.eagle_worker import EagleWorker

    sa = ServerArgs(
        model_path=ckpt, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=1024,
        prefill_token_buckets=[64], decode_bs_buckets=[4],
        max_running_requests=4, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    runner = ModelRunner(sa)
    w = EagleWorker(sa, runner, mode="mtp")
    assert w.model.layer_index == 2
    assert "eh_proj" in w.params and "lm_head" in w.params
    assert w.params["layers"][0]["kv_a"].shape == (64, 40)
    # draft KV pool uses the latent single-head geometry
    assert w.kv_layers[0].shape[1] == 2 * 1 and w.kv_layers[0].shape[3] == 32 + 8
