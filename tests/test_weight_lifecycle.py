"""RL weight lifecycle (reference F6): update_weights_from_disk /
update_weights_from_tensor must change generations; release/resume must
round-trip and keep serving."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def two_checkpoints(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    paths = []
    models = []
    for seed in (0, 1):
        p = tmp_path_factory.mktemp(f"ckpt{seed}")
        torch.manual_seed(seed)
        m = LlamaForCausalLM(cfg).eval()
        m.save_pretrained(p)
        paths.append(str(p))
        models.append(m)
    return paths, models


def _engine(path):
    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.server_args import ServerArgs

    return Engine(
        ServerArgs(
            model_path=path, dtype="float32", device="cpu", page_size=16,
            context_length=256, max_total_tokens=2048,
            prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
            max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
            log_level="warning",
        )
    )


def _hf_greedy(m, p, n):
    with torch.no_grad():
        return m.generate(torch.tensor([p]), max_new_tokens=n, do_sample=False)[
            0
        ].tolist()[len(p):]


def test_update_weights_from_disk(two_checkpoints):
    (p0, p1), (m0, m1) = two_checkpoints
    eng = _engine(p0)
    prompt = [int(x) for x in np.random.default_rng(0).integers(3, 250, size=9)]
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    assert eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"] == _hf_greedy(m0, prompt, 6)
    eng.update_weights_from_disk(p1)
    assert eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"] == _hf_greedy(m1, prompt, 6)


def test_update_weights_from_tensor(two_checkpoints):
    (p0, p1), (m0, m1) = two_checkpoints
    eng = _engine(p0)
    named = {k: v.numpy() for k, v in m1.state_dict().items()}
    n = eng.update_weights_from_tensor(named)
    assert n > 0
    prompt = [int(x) for x in np.random.default_rng(1).integers(3, 250, size=9)]
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    assert eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"] == _hf_greedy(m1, prompt, 6)


def test_release_resume_memory(two_checkpoints):
    (p0, _), (m0, _) = two_checkpoints
    eng = _engine(p0)
    prompt = [int(x) for x in np.random.default_rng(2).integers(3, 250, size=9)]
    sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}
    before = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    eng.release_memory_occupation()
    assert eng.runner.params is None
    eng.resume_memory_occupation()
    after = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    assert after == before
    assert eng.scheduler.check_memory() == 0


def test_update_weights_from_distributed(two_checkpoints):
    """Trainer pushes weights over TCP; the engine applies them atomically
    (reference init_weights_update_group + update_weights_from_distributed,
    model_runner.py:1980 — NCCL broadcast replaced by a DCN push stream)."""
    import numpy as np
    from safetensors.numpy import load_file
    import glob
    import threading

    from sglang_tpu import Engine
    from sglang_tpu.model_executor.weight_sync import push_weights

    (tiny_checkpoint, _), _ = two_checkpoints
    engine = Engine(
        model_path=tiny_checkpoint,
        device="cpu",
        dtype="float32",
        skip_tokenizer_init=True,
        page_size=16,
        max_total_tokens=1024,
        context_length=128,
        decode_bs_buckets=[4],
        prefill_token_buckets=[64],
        random_seed=0,
        log_level="warning",
    )
    try:
        before = engine.generate(
            input_ids=[[5, 6, 7]],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                             "ignore_eos": True},
        )[0]["output_ids"]
        port = engine.init_weights_update_group(host="127.0.0.1")
        # trainer side: perturb the embedding + an attention projection
        t = load_file(glob.glob(tiny_checkpoint + "/*.safetensors")[0])
        rng = np.random.default_rng(0)
        emb = t["model.embed_tokens.weight"] + rng.standard_normal(
            t["model.embed_tokens.weight"].shape
        ).astype(np.float32)
        push = [
            ("model.embed_tokens.weight", emb),
            ("model.layers.0.self_attn.q_proj.weight",
             t["model.layers.0.self_attn.q_proj.weight"] * 0.5),
            ("model.layers.0.self_attn.k_proj.weight",
             t["model.layers.0.self_attn.k_proj.weight"]),
            ("model.layers.0.self_attn.v_proj.weight",
             t["model.layers.0.self_attn.v_proj.weight"]),
        ]
        applied = push_weights(("127.0.0.1", port), push)
        assert applied >= 2  # embed + fused qkv group
        assert engine.update_weights_from_distributed(version=1, timeout=30)
        # the pushed embedding is live in the serving params
        np.testing.assert_allclose(
            np.asarray(engine.runner.params["embed"]), emb, atol=1e-6
        )
        # and the engine still serves
        after = engine.generate(
            input_ids=[[5, 6, 7]],
            sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                             "ignore_eos": True},
        )[0]["output_ids"]
        assert len(after) == len(before) == 5
    finally:
        engine.shutdown()
