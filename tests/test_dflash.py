"""DFLASH block-draft speculation (S5, reference dflash_worker.py): the
draft predicts the whole K-token block in ONE forward from projected
target features + mask-token embeddings; verification keeps greedy output
IDENTICAL to plain decoding."""

import json
import os
import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _save_dflash_ckpt(path, rng, h=64, kv=2, heads=4, inter=128,
                      num_context=2, layers=1):
    from safetensors.numpy import save_file

    def W(*shape, scale=0.05):
        return np.ascontiguousarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        )

    hd = h // heads
    tensors = {
        "fc.weight": W(h, num_context * h),
        "hidden_norm.weight": np.ones(h, dtype=np.float32),
        "norm.weight": np.ones(h, dtype=np.float32),
    }
    for i in range(layers):
        lp = f"layers.{i}"
        tensors.update({
            f"{lp}.input_layernorm.weight": np.ones(h, dtype=np.float32),
            f"{lp}.post_attention_layernorm.weight": np.ones(h, dtype=np.float32),
            f"{lp}.self_attn.q_proj.weight": W(heads * hd, h),
            f"{lp}.self_attn.k_proj.weight": W(kv * hd, h),
            f"{lp}.self_attn.v_proj.weight": W(kv * hd, h),
            f"{lp}.self_attn.o_proj.weight": W(h, heads * hd),
            f"{lp}.mlp.gate_proj.weight": W(inter, h),
            f"{lp}.mlp.up_proj.weight": W(inter, h),
            f"{lp}.mlp.down_proj.weight": W(h, inter),
        })
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg = {
        "architectures": ["DFlashDraftModel"],
        "hidden_size": h, "num_hidden_layers": layers,
        "num_attention_heads": heads, "num_key_value_heads": kv,
        "intermediate_size": inter, "vocab_size": 256,
        "max_position_embeddings": 256, "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0, "torch_dtype": "float32",
        "dflash_block_size": 4, "mask_token_id": 255,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    target = tmp_path_factory.mktemp("dflash_target")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(2)
    LlamaForCausalLM(cfg).eval().save_pretrained(target)
    draft = tmp_path_factory.mktemp("dflash_draft")
    _save_dflash_ckpt(str(draft), np.random.default_rng(11), num_context=2)
    return str(target), str(draft)


def _run(target, draft_path, prompts, n=14):
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=target, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
        speculative_algorithm="DFLASH" if draft_path else None,
        speculative_draft_model_path=draft_path,
        speculative_num_draft_tokens=4,
        speculative_eagle_topk=1,
    )
    sched = Scheduler(sa)
    rids = []
    for p in prompts:
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid, input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=n, temperature=0.0, ignore_eos=True
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
        assert steps < 600
    return [outs[r].output_ids for r in rids], sched


def test_dflash_is_lossless(checkpoints):
    target, draft = checkpoints
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (6, 19, 33)]
    base, _ = _run(target, None, prompts)
    spec, sched = _run(target, draft, prompts)
    assert spec == base
    assert sched.runner.capture_aux
    assert sched.draft_worker.num_draft == 4  # min(cli, block_size)
    assert not sched.draft_worker.states
    assert sched.draft_worker.allocator.check_leaks() == 0
    assert sched.check_memory() == 0


def test_dflash_block_proposes_k_tokens(checkpoints):
    """The block forward proposes exactly num_draft tokens per request in
    one call (no per-token draft autoregression)."""
    target, draft = checkpoints
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=target, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning", speculative_algorithm="DFLASH",
        speculative_draft_model_path=draft,
        speculative_num_draft_tokens=4, speculative_eagle_topk=1,
    )
    sched = Scheduler(sa)
    calls = []
    orig = sched.draft_worker.propose_batch

    def spy(reqs):
        out = orig(reqs)
        calls.append([len(d) for d in out])
        return out

    sched.draft_worker.propose_batch = spy
    sched.add_request(
        TokenizedGenerateReqInput(
            rid="d0", input_ids=list(range(3, 12)),
            sampling_params=SamplingParams(
                max_new_tokens=12, temperature=0.0, ignore_eos=True
            ),
        )
    )
    while sched.has_work():
        sched.step()
    assert calls and all(c == [4] for c in calls if c)
