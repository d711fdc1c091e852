"""dLLM block diffusion (F8, reference `srt/dllm/algorithm/`): iterative
low-confidence unmasking over blocks with bidirectional intra-block
attention, served through Engine.diffusion_generate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("dllm_model")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=True,
        mask_token_id=255,
    )
    torch.manual_seed(4)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)
    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=512, max_total_tokens=4096,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    yield eng
    eng.shutdown()


def test_diffusion_generate_deterministic_and_clean(engine):
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(3, 250, size=9)]
    out1 = engine.diffusion_generate(
        input_ids=prompt, max_new_tokens=16, block_size=8, threshold=0.5
    )
    out2 = engine.diffusion_generate(
        input_ids=prompt, max_new_tokens=16, block_size=8, threshold=0.5
    )
    assert out1["output_ids"] == out2["output_ids"]
    assert len(out1["output_ids"]) <= 16
    assert out1["meta_info"]["completion_tokens"] == len(out1["output_ids"])
    # pages fully reclaimed
    assert engine.scheduler.check_memory() == 0


def test_threshold_extremes_control_iterations(engine):
    """threshold > 1 commits exactly one position per iteration (the top-1
    fallback); threshold <= 0 commits the whole block in one pass — both
    must converge and stay deterministic."""
    rng = np.random.default_rng(1)
    prompt = [int(x) for x in rng.integers(3, 250, size=6)]
    calls = {"n": 0}
    orig = engine.runner.forward_dllm_block

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    engine.runner.forward_dllm_block = spy
    engine.diffusion_generate(
        input_ids=prompt, max_new_tokens=8, block_size=8, threshold=1.5
    )
    slow = calls["n"]
    calls["n"] = 0
    engine.diffusion_generate(
        input_ids=prompt, max_new_tokens=8, block_size=8, threshold=-1.0
    )
    fast = calls["n"]
    engine.runner.forward_dllm_block = orig
    assert slow == 8 and fast == 1, (slow, fast)


def test_joint_threshold_algorithm(engine):
    rng = np.random.default_rng(2)
    prompt = [int(x) for x in rng.integers(3, 250, size=7)]
    out = engine.diffusion_generate(
        input_ids=prompt, max_new_tokens=8, block_size=8,
        threshold=0.2, algorithm="joint_threshold",
    )
    assert len(out["output_ids"]) <= 8
    assert engine.scheduler.check_memory() == 0


def test_intra_block_attention_is_bidirectional(engine):
    """Witness: with bidirectional masking, changing a LATER block token
    changes the logits at an EARLIER block position (impossible under a
    causal mask)."""
    runner = engine.runner
    alloc = engine.scheduler.allocator
    ps = alloc.page_size
    prompt = list(range(3, 3 + 6))
    block = 8
    total = len(prompt) + block
    pages = alloc.alloc(-(-total // ps))
    try:
        pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
        pt[0, : len(pages)] = pages

        def slot(p):
            return pages[p // ps] * ps + p % ps

        runner.forward_extend_hidden(
            np.asarray(prompt, dtype=np.int32),
            np.arange(len(prompt), dtype=np.int32),
            np.asarray([slot(p) for p in range(len(prompt))], np.int32),
            pt, np.array([len(prompt)]), np.array([len(prompt)]),
        )
        start = len(prompt)
        positions = np.arange(start, start + block, dtype=np.int32)
        mask_pos = np.full(block, start + block - 1, dtype=np.int32)
        loc = np.asarray([slot(p) for p in range(start, start + block)], np.int32)
        b1 = np.full(block, 255, dtype=np.int32)
        b2 = b1.copy()
        b2[-1] = 42  # change only the LAST block token
        l1 = runner.forward_dllm_block(
            b1, positions, mask_pos, loc, pt,
            np.array([start + block]), np.array([block]),
        )
        l2 = runner.forward_dllm_block(
            b2, positions, mask_pos, loc, pt,
            np.array([start + block]), np.array([block]),
        )
        assert np.abs(l1[0] - l2[0]).max() > 1e-6
    finally:
        alloc.free(pages)
