"""Kimi-VL: MoonViT tower + DeepSeek-V2 language model. No transformers
class exists (upstream ships trust_remote_code), so the checkpoint is
assembled by hand (DSv2 tensors under `language_model.*` + random
MoonViT tensors) and the vision tower is checked against an independent
torch implementation of the published architecture written here."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import torch.nn.functional as F

VC = dict(
    model_type="moonvit",
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    patch_size=14,
    init_pos_emb_height=4,
    init_pos_emb_width=3,
    merge_kernel_size=[2, 2],
)
GRID = (6, 4)  # 24 patches -> 6 merged tokens; pos table is 4x3
IMG_TOK = 250


def _dsv2_cfg():
    from transformers import DeepseekV2Config

    return DeepseekV2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
        aux_loss_alpha=0.0, pad_token_id=0,
    )


# --------------------------------------------- independent torch MoonViT


class TorchMoonViT(torch.nn.Module):
    """Written from the published MoonViT architecture description:
    conv patch embed + interpolated 2D pos table, LN blocks with biased
    fused wqkv/wo + complex-pair 2D rope + gelu-tanh MLP, final LN,
    2x2 merge, LN -> linear -> QuickGELU -> linear projector."""

    def __init__(self, vc, text_hidden):
        super().__init__()
        h, inter = vc["hidden_size"], vc["intermediate_size"]
        p = vc["patch_size"]
        self.heads = vc["num_attention_heads"]
        self.proj = torch.nn.Conv2d(3, h, kernel_size=p, stride=p)
        self.pos = torch.nn.Parameter(
            torch.randn(vc["init_pos_emb_height"], vc["init_pos_emb_width"], h)
        )
        def blk():
            m = torch.nn.Module()
            m.norm0 = torch.nn.LayerNorm(h)
            m.norm1 = torch.nn.LayerNorm(h)
            m.wqkv = torch.nn.Linear(h, 3 * h, bias=True)
            m.wo = torch.nn.Linear(h, h, bias=True)
            m.fc0 = torch.nn.Linear(h, inter, bias=True)
            m.fc1 = torch.nn.Linear(inter, h, bias=True)
            return m
        self.blocks = torch.nn.ModuleList(
            [blk() for _ in range(vc["num_hidden_layers"])]
        )
        self.final_ln = torch.nn.LayerNorm(h)
        self.pre_norm = torch.nn.LayerNorm(h)
        self.linear_1 = torch.nn.Linear(4 * h, 4 * h, bias=True)
        self.linear_2 = torch.nn.Linear(4 * h, text_hidden, bias=True)

    def freqs_cis(self, hh, ww, hd):
        n = hh * ww
        flat = torch.arange(n)
        x = (flat % ww).float()
        y = (flat // ww).float()
        f = 1.0 / (10000.0 ** (torch.arange(0, hd, 4).float() / hd))
        xc = torch.polar(torch.ones(n, hd // 4), torch.outer(x, f))
        yc = torch.polar(torch.ones(n, hd // 4), torch.outer(y, f))
        return torch.cat([xc.unsqueeze(-1), yc.unsqueeze(-1)], -1).reshape(
            n, hd // 2
        )

    def forward(self, tiles, grid):
        hh, ww = grid
        x = self.proj(tiles).reshape(tiles.shape[0], -1)
        pos = (
            F.interpolate(
                self.pos.permute(2, 0, 1).unsqueeze(0),
                size=(hh, ww),
                mode="bicubic",
            )
            .squeeze(0)
            .permute(1, 2, 0)
            .reshape(hh * ww, -1)
        )
        x = x + pos
        hd = x.shape[-1] // self.heads
        cis = self.freqs_cis(hh, ww, hd)
        n = x.shape[0]
        for b in self.blocks:
            y = b.norm0(x)
            qkv = b.wqkv(y).view(n, 3, self.heads, hd)
            q, k, v = qkv.unbind(1)

            def rot(t):
                tc = torch.view_as_complex(
                    t.float().reshape(n, self.heads, hd // 2, 2)
                )
                return torch.view_as_real(tc * cis[:, None, :]).reshape(
                    n, self.heads, hd
                )

            q, k = rot(q), rot(k)
            att = torch.einsum("qhd,khd->hqk", q, k) / math.sqrt(hd)
            att = att.softmax(-1)
            o = torch.einsum("hqk,khd->qhd", att, v).reshape(n, -1)
            x = x + b.wo(o)
            y = b.norm1(x)
            x = x + b.fc1(F.gelu(b.fc0(y), approximate="tanh"))
        x = self.final_ln(x)
        x = x.view(hh // 2, 2, ww // 2, 2, -1).permute(0, 2, 1, 3, 4)
        x = x.reshape(-1, 4, x.shape[-1])
        x = self.pre_norm(x).reshape(x.shape[0], -1)
        x = self.linear_1(x)
        x = x * torch.sigmoid(1.702 * x)
        return self.linear_2(x)


def _save_kimi(tmp_path_factory, torch_vit, hf_text):
    """Assemble a kimi_vl checkpoint: DSv2 under language_model.* plus
    the MoonViT/projector tensors under their published names."""
    from safetensors.torch import save_file

    path = tmp_path_factory.mktemp("tiny_kimi_vl")
    tensors = {}
    for k, v in hf_text.state_dict().items():
        if k == "lm_head.weight":  # tied with embed_tokens
            continue
        tensors[f"language_model.{k}"] = v.clone().contiguous()
    sd = torch_vit.state_dict()
    name_map = {
        "proj.weight": "vision_tower.patch_embed.proj.weight",
        "proj.bias": "vision_tower.patch_embed.proj.bias",
        "pos": "vision_tower.patch_embed.pos_emb.weight",
        "final_ln.weight": "vision_tower.encoder.final_layernorm.weight",
        "final_ln.bias": "vision_tower.encoder.final_layernorm.bias",
        "pre_norm.weight": "multi_modal_projector.pre_norm.weight",
        "pre_norm.bias": "multi_modal_projector.pre_norm.bias",
        "linear_1.weight": "multi_modal_projector.linear_1.weight",
        "linear_1.bias": "multi_modal_projector.linear_1.bias",
        "linear_2.weight": "multi_modal_projector.linear_2.weight",
        "linear_2.bias": "multi_modal_projector.linear_2.bias",
    }
    for ours, theirs in name_map.items():
        tensors[theirs] = sd[ours].contiguous()
    for i in range(VC["num_hidden_layers"]):
        for leaf in ("norm0", "norm1", "wqkv", "wo"):
            for wb in ("weight", "bias"):
                tensors[
                    f"vision_tower.encoder.blocks.{i}.{leaf}.{wb}"
                ] = sd[f"blocks.{i}.{leaf}.{wb}"].contiguous()
        for src, dst in (("fc0", "mlp.fc0"), ("fc1", "mlp.fc1")):
            for wb in ("weight", "bias"):
                tensors[
                    f"vision_tower.encoder.blocks.{i}.{dst}.{wb}"
                ] = sd[f"blocks.{i}.{src}.{wb}"].contiguous()
    save_file(tensors, str(path / "model.safetensors"))
    cfg = {
        "architectures": ["KimiVLForConditionalGeneration"],
        "model_type": "kimi_vl",
        "media_placeholder_token_id": IMG_TOK,
        "vision_config": VC,
        "text_config": json.loads(_dsv2_cfg().to_json_string()),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    return path


@pytest.fixture(scope="module")
def kimi_setup(tmp_path_factory):
    from transformers import DeepseekV2ForCausalLM

    torch.manual_seed(70)
    hf_text = DeepseekV2ForCausalLM(_dsv2_cfg()).eval()
    vit = TorchMoonViT(VC, text_hidden=64).eval()
    path = _save_kimi(tmp_path_factory, vit, hf_text)
    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    yield hf_text, vit, eng
    eng.shutdown()


def test_moonvit_pos_embed_matches_torch_interpolate():
    """Rectangular table resized with the static gather plan must equal
    torch F.interpolate(mode='bicubic', align_corners=False)."""
    from sglang_tpu.models.glm4v import bicubic_resize_plan

    rng = np.random.default_rng(0)
    for (sh, sw), (dh, dw) in [((4, 3), (6, 4)), ((4, 3), (4, 3)),
                               ((5, 7), (2, 9))]:
        tab = rng.standard_normal((sh, sw, 8)).astype(np.float32)
        ref = (
            F.interpolate(
                torch.tensor(tab).permute(2, 0, 1).unsqueeze(0),
                size=(dh, dw),
                mode="bicubic",
            )
            .squeeze(0)
            .permute(1, 2, 0)
            .reshape(dh * dw, 8)
            .numpy()
        )
        idx, wts = bicubic_resize_plan(sh, sw, dh, dw)
        got = (tab.reshape(-1, 8)[idx] * wts[..., None]).sum(1)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_kimi_vl_vision_matches_independent_torch(kimi_setup):
    _, vit, eng = kimi_setup
    rng = np.random.default_rng(71)
    n = GRID[0] * GRID[1]
    tiles = rng.standard_normal((n, 3, 14, 14)).astype(np.float32)
    with torch.no_grad():
        ref = vit(torch.tensor(tiles), GRID).numpy()
    got = np.asarray(eng.runner.encode_images(tiles, grid_thw=GRID))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_kimi_vl_text_matches_hf_deepseek(kimi_setup):
    """The language path (prefix-remapped DSv2 weights) must match HF
    DeepseekV2 greedy generation token-for-token."""
    hf_text, _, eng = kimi_setup
    prompt = [int(x) for x in np.random.default_rng(72).integers(3, 200, 9)]
    with torch.no_grad():
        ref = hf_text.generate(
            input_ids=torch.tensor([prompt]), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        )[0, len(prompt):].tolist()
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref


def test_kimi_vl_generate_with_image(kimi_setup):
    """End-to-end: image embeddings land on the placeholders and decode
    proceeds deterministically (self-consistency across two runs)."""
    _, _, eng = kimi_setup
    rng = np.random.default_rng(73)
    n = GRID[0] * GRID[1]
    tiles = rng.standard_normal((n, 3, 14, 14)).astype(np.float32)
    n_tok = n // 4
    ids = (
        rng.integers(3, 200, size=3).tolist()
        + [IMG_TOK] * n_tok
        + rng.integers(3, 200, size=3).tolist()
    )
    outs = [
        eng.generate(
            input_ids=ids,
            image_data={"pixel_values": tiles, "grid_hw": GRID},
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
            return_logprob=True,
        )
        for _ in range(2)
    ]
    assert outs[0]["output_ids"] == outs[1]["output_ids"]
    assert len(outs[0]["output_ids"]) == 6
    # the random tiny model may emit the same argmax with or without the
    # image, but the LOGPROBS must shift if the embeddings really land
    plain = eng.generate(
        input_ids=[i if i != IMG_TOK else 5 for i in ids],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
        return_logprob=True,
    )
    lp_img = outs[0]["meta_info"]["output_token_logprobs"]
    lp_plain = plain["meta_info"]["output_token_logprobs"]
    assert not np.allclose(lp_img, lp_plain, atol=1e-6)
