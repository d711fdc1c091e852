"""EAGLE speculative decoding (reference `eagle_worker.py` behavior):
whatever the draft head proposes, greedy output must be IDENTICAL to
plain target decoding; draft KV pages must be fully reclaimed."""

import json
import os
import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _save_eagle_ckpt(path, rng, h=64, kv=2, heads=4, inter=128, vocab=256):
    """Synthetic EAGLE-1 draft: fc + ONE decoder layer, no
    layers.0.input_layernorm, no final norm, no lm_head (target's is used)."""
    from safetensors.numpy import save_file

    def W(*shape, scale=0.05):
        return np.ascontiguousarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        )

    hd = h // heads
    tensors = {
        "embed_tokens.weight": W(vocab, h),
        "fc.weight": W(h, 2 * h),
        "fc.bias": np.zeros(h, dtype=np.float32),
        "layers.0.post_attention_layernorm.weight": np.ones(h, dtype=np.float32),
        "layers.0.self_attn.q_proj.weight": W(heads * hd, h),
        "layers.0.self_attn.k_proj.weight": W(kv * hd, h),
        "layers.0.self_attn.v_proj.weight": W(kv * hd, h),
        "layers.0.self_attn.o_proj.weight": W(h, heads * hd),
        "layers.0.mlp.gate_proj.weight": W(inter, h),
        "layers.0.mlp.up_proj.weight": W(inter, h),
        "layers.0.mlp.down_proj.weight": W(h, inter),
    }
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "hidden_size": h,
        "num_hidden_layers": 1,
        "num_attention_heads": heads,
        "num_key_value_heads": kv,
        "intermediate_size": inter,
        "vocab_size": vocab,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    target = tmp_path_factory.mktemp("eagle_target")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(target)
    draft = tmp_path_factory.mktemp("eagle_draft")
    _save_eagle_ckpt(str(draft), np.random.default_rng(5))
    return str(target), str(draft)


def _run(target, draft_path=None, prompts=None, n=16):
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
        speculative_algorithm="EAGLE" if draft_path else None,
        speculative_draft_model_path=draft_path,
        speculative_num_draft_tokens=4,
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


def test_eagle_is_lossless(checkpoints):
    target, draft = checkpoints
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (8, 21)]
    base, _ = _run(target, None, prompts)
    spec, sched = _run(target, draft, prompts)
    assert spec == base  # a random draft may be useless, never wrong
    # draft state dropped + all draft pages reclaimed on finish
    assert not sched.draft_worker.states
    assert sched.draft_worker.allocator.check_leaks() == 0
    assert sched.check_memory() == 0


def test_eagle_long_prompt_chunked_catchup(checkpoints):
    """First-round catch-up larger than the prefill token bucket goes
    through the sub-chunk path."""
    target, draft = checkpoints
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, 250, size=150).tolist()]
    base, _ = _run(target, None, prompts, n=8)
    spec, sched = _run(target, draft, prompts, n=8)
    assert spec == base
    assert sched.check_memory() == 0


def test_feature_capture_stops_recompute(checkpoints):
    """After the first round (prompt features), catch-up uses features
    captured from verify forwards instead of recomputing the target."""
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
        log_level="warning", speculative_algorithm="EAGLE",
        speculative_draft_model_path=draft, speculative_num_draft_tokens=4,
    )
    sched = Scheduler(sa)
    calls = {"n": 0}
    orig = sched.runner.forward_extend_hidden

    def counted(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    sched.runner.forward_extend_hidden = counted
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid, input_ids=list(range(3, 15)),
            sampling_params=SamplingParams(
                max_new_tokens=16, temperature=0.0, ignore_eos=True
            ),
        )
    )
    steps = 0
    while sched.has_work():
        sched.step()
        steps += 1
        assert steps < 400
    # exactly ONE recompute (the prompt features, first round); every later
    # round's features came from verify capture
    assert calls["n"] == 1, calls["n"]


def test_tree_vs_chain_both_lossless(checkpoints):
    """Tree speculation (root-branched paths, scratch-page verify) and
    chain speculation must BOTH equal plain greedy decoding."""
    target, draft = checkpoints
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    rng = np.random.default_rng(8)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (11, 27, 6)]

    def run(topk):
        sa = ServerArgs(
            model_path=target, dtype="float32", device="cpu", page_size=16,
            context_length=256, max_total_tokens=2048,
            prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
            max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
            log_level="warning",
            speculative_algorithm="EAGLE" if topk else None,
            speculative_draft_model_path=draft if topk else None,
            speculative_num_draft_tokens=4,
            speculative_eagle_topk=topk or 4,
        )
        sched = Scheduler(sa)
        rids = []
        for p in prompts:
            rid = uuid.uuid4().hex
            sched.add_request(
                TokenizedGenerateReqInput(
                    rid=rid, input_ids=p,
                    sampling_params=SamplingParams(
                        max_new_tokens=14, temperature=0.0, ignore_eos=True
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

    base, _ = run(None)
    chain, s1 = run(1)
    tree, s2 = run(3)
    assert chain == base
    assert tree == base
    # all scratch + draft pages reclaimed, no target page leaks
    for s in (s1, s2):
        assert not s.draft_worker.states
        assert s.draft_worker.allocator.check_leaks() == 0
        assert s.check_memory() == 0


# ------------------------------------------------------------------ EAGLE3

def _save_eagle3_ckpt(path, rng, h=64, kv=2, heads=4, inter=128, vocab=256,
                      draft_vocab=200, num_aux=2):
    """Synthetic EAGLE3 draft (reference llama_eagle3 layout, legacy
    `midlayer.*` names): fc over num_aux fused target layers, dual-norm
    2H-input attention, OWN draft-vocab lm_head + d2t id mapping."""
    from safetensors.numpy import save_file

    def W(*shape, scale=0.05):
        return np.ascontiguousarray(
            rng.standard_normal(shape).astype(np.float32) * scale
        )

    hd = h // heads
    d2t = ((np.arange(draft_vocab) * 7) % vocab - np.arange(draft_vocab)).astype(
        np.int64
    )
    tensors = {
        "embed_tokens.weight": W(vocab, h),
        "fc.weight": W(h, num_aux * h),
        "midlayer.input_layernorm.weight": np.ones(h, dtype=np.float32),
        "midlayer.hidden_norm.weight": np.ones(h, dtype=np.float32),
        "midlayer.post_attention_layernorm.weight": np.ones(h, dtype=np.float32),
        "midlayer.self_attn.q_proj.weight": W(heads * hd, 2 * h),
        "midlayer.self_attn.k_proj.weight": W(kv * hd, 2 * h),
        "midlayer.self_attn.v_proj.weight": W(kv * hd, 2 * h),
        "midlayer.self_attn.o_proj.weight": W(h, heads * hd),
        "midlayer.mlp.gate_proj.weight": W(inter, h),
        "midlayer.mlp.up_proj.weight": W(inter, h),
        "midlayer.mlp.down_proj.weight": W(h, inter),
        "norm.weight": np.ones(h, dtype=np.float32),
        "lm_head.weight": W(draft_vocab, h),
        "d2t": d2t,
        "t2d": np.zeros(vocab, dtype=np.int64),
    }
    os.makedirs(path, exist_ok=True)
    save_file(tensors, os.path.join(path, "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLMEagle3"],
        "hidden_size": h,
        "num_hidden_layers": 1,
        "num_attention_heads": heads,
        "num_key_value_heads": kv,
        "intermediate_size": inter,
        "vocab_size": vocab,
        "draft_vocab_size": draft_vocab,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)


@pytest.fixture(scope="module")
def eagle3_checkpoints(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    target = tmp_path_factory.mktemp("eagle3_target")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    LlamaForCausalLM(cfg).eval().save_pretrained(target)
    draft = tmp_path_factory.mktemp("eagle3_draft")
    # L=4 target -> capture layers sorted({2, 2, 1}) = [1, 2] -> num_aux 2
    _save_eagle3_ckpt(str(draft), np.random.default_rng(9), num_aux=2)
    return str(target), str(draft)


def _run3(target, draft_path, prompts, n=16):
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
        speculative_algorithm="EAGLE3" if draft_path else None,
        speculative_draft_model_path=draft_path,
        speculative_num_draft_tokens=4,
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


def test_eagle3_is_lossless(eagle3_checkpoints):
    """EAGLE3 (multi-layer aux features + draft vocab mapping): greedy
    output identical to plain decoding; aux capture and d2t mapping active."""
    target, draft = eagle3_checkpoints
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (7, 23)]
    base, _ = _run3(target, None, prompts)
    spec, sched = _run3(target, draft, prompts)
    assert spec == base
    assert sched.runner.capture_aux
    assert sched.runner.model.layers_to_capture == [1, 2]
    assert sched.draft_worker.feat_dim == 2 * 64
    assert not sched.draft_worker.states
    assert sched.draft_worker.allocator.check_leaks() == 0
    assert sched.check_memory() == 0


def test_eagle3_tree_mode_lossless(eagle3_checkpoints):
    target, draft = eagle3_checkpoints
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput  # noqa
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 250, size=11).tolist()]
    base, _ = _run3(target, None, prompts, n=10)
    # tree mode via topk>1
    from sglang_tpu.server_args import ServerArgs
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams

    sa = ServerArgs(
        model_path=target, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning", speculative_algorithm="EAGLE3",
        speculative_draft_model_path=draft, speculative_num_draft_tokens=4,
        speculative_eagle_topk=2,
    )
    sched = Scheduler(sa)
    sched.add_request(
        TokenizedGenerateReqInput(
            rid="t0", input_ids=prompts[0],
            sampling_params=SamplingParams(
                max_new_tokens=10, temperature=0.0, ignore_eos=True
            ),
        )
    )
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o.output_ids
        steps += 1
        assert steps < 600
    assert outs["t0"] == base[0]
    assert sched.check_memory() == 0
