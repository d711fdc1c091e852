"""Embedding / reranker model classes: BERT & XLM-RoBERTa encoders and
decoder sequence-classification heads (reference `srt/models/{bert,roberta,
llama_classification,qwen2_classification}.py`)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _engine(path, **kw):
    from sglang_tpu.entrypoints.engine import Engine

    return Engine(
        model_path=path,
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
        **kw,
    )


def _save(model, tmp_path_factory, name):
    path = tmp_path_factory.mktemp(name)
    model.save_pretrained(path)
    return str(path)


@pytest.mark.parametrize("family", ["bert", "roberta"])
def test_encoder_embedding_parity(tmp_path_factory, family):
    if family == "bert":
        from transformers import BertConfig, BertModel

        cfg = BertConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, vocab_size=256,
            max_position_embeddings=128, type_vocab_size=2,
        )
        torch.manual_seed(0)
        hf = BertModel(cfg).eval()
        offset = 0
    else:
        from transformers import XLMRobertaConfig, XLMRobertaModel

        cfg = XLMRobertaConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, vocab_size=256,
            max_position_embeddings=130, type_vocab_size=1, pad_token_id=1,
        )
        torch.manual_seed(0)
        hf = XLMRobertaModel(cfg).eval()
        offset = 2

    path = _save(hf, tmp_path_factory, f"tiny_{family}")
    eng = _engine(path)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(3, 250, size=n).tolist() for n in (7, 11)]
    got = eng.encode(input_ids=seqs, pooling="mean")
    with torch.no_grad():
        for ids, out in zip(seqs, got):
            t = torch.tensor([ids])
            if family == "roberta":
                pos = torch.arange(offset, offset + len(ids))[None]
                want = hf(t, position_ids=pos).last_hidden_state[0]
            else:
                want = hf(t).last_hidden_state[0]
            np.testing.assert_allclose(
                np.asarray(out["embedding"]),
                want.mean(0).numpy(),
                atol=2e-3,
                rtol=2e-3,
            )


def test_encoder_cls_pooling(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256, max_position_embeddings=128,
    )
    torch.manual_seed(1)
    hf = BertModel(cfg).eval()
    eng = _engine(_save(hf, tmp_path_factory, "tiny_bert_cls"))
    ids = [5, 6, 7, 8]
    got = eng.encode(input_ids=[ids], pooling="cls")[0]["embedding"]
    with torch.no_grad():
        want = hf(torch.tensor([ids])).last_hidden_state[0, 0].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_encoder_rejects_generate(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, vocab_size=128, max_position_embeddings=64,
    )
    eng = _engine(_save(BertModel(cfg), tmp_path_factory, "tiny_bert_gen"))
    with pytest.raises(ValueError, match="encoder-only"):
        eng.generate(input_ids=[[1, 2, 3]], sampling_params={"max_new_tokens": 2})


def test_sequence_classification_parity(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForSequenceClassification

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=128, num_labels=3, pad_token_id=0,
    )
    torch.manual_seed(2)
    hf = LlamaForSequenceClassification(cfg).eval()
    eng = _engine(_save(hf, tmp_path_factory, "tiny_cls"))
    rng = np.random.default_rng(2)
    seqs = [rng.integers(3, 250, size=n).tolist() for n in (5, 9)]
    got = eng.encode(input_ids=seqs, pooling="last")
    with torch.no_grad():
        for ids, out in zip(seqs, got):
            want = hf(torch.tensor([ids])).logits[0].numpy()
            np.testing.assert_allclose(
                np.asarray(out["embedding"]), want, atol=2e-3, rtol=2e-3
            )


def test_qwen2_reward_head(tmp_path_factory):
    """Reward models are num_labels == 1 classification (reference
    qwen2_rm.py)."""
    from transformers import Qwen2Config, Qwen2ForSequenceClassification

    cfg = Qwen2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=128, num_labels=1, pad_token_id=0,
    )
    torch.manual_seed(3)
    hf = Qwen2ForSequenceClassification(cfg).eval()
    eng = _engine(_save(hf, tmp_path_factory, "tiny_rm"))
    ids = [4, 5, 6, 7, 8]
    got = eng.encode(input_ids=[ids], pooling="last")[0]["embedding"]
    with torch.no_grad():
        want = hf(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_gemma2_sequence_classification_parity(tmp_path_factory):
    from transformers import Gemma2Config, Gemma2ForSequenceClassification

    cfg = Gemma2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=128, head_dim=16, num_labels=3,
        pad_token_id=0, sliding_window=64,
    )
    torch.manual_seed(4)
    hf = Gemma2ForSequenceClassification(cfg).eval()
    eng = _engine(_save(hf, tmp_path_factory, "tiny_g2cls"))
    ids = [4, 5, 6, 7, 8, 9]
    got = eng.encode(input_ids=[ids], pooling="last")[0]["embedding"]
    with torch.no_grad():
        want = hf(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)


def test_qwen2_reward_model_two_layer_head(tmp_path_factory):
    """The reference Qwen2ForRewardModel head is Linear->ReLU->Linear
    over the last-token hidden state (qwen2_rm.py:47, keys score.0/2).
    No HF class exists, so assemble the checkpoint: a qwen2 backbone
    plus random score tensors, oracle computed from HF hidden states."""
    import json as _json

    from safetensors.torch import save_file
    from transformers import Qwen2Config, Qwen2Model

    cfg = Qwen2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(5)
    base = Qwen2Model(cfg).eval()
    s0 = torch.nn.Linear(64, 64)
    s2 = torch.nn.Linear(64, 1)
    path = tmp_path_factory.mktemp("tiny_qwen2rm")
    tensors = {f"model.{k}": v.contiguous() for k, v in base.state_dict().items()}
    tensors.update({
        "score.0.weight": s0.weight.contiguous(),
        "score.0.bias": s0.bias.contiguous(),
        "score.2.weight": s2.weight.contiguous(),
        "score.2.bias": s2.bias.contiguous(),
    })
    save_file(tensors, str(path / "model.safetensors"))
    d = _json.loads(cfg.to_json_string())
    d["architectures"] = ["Qwen2ForRewardModel"]
    d["num_labels"] = 1
    (path / "config.json").write_text(_json.dumps(d))

    eng = _engine(str(path))
    ids = [4, 5, 6, 7, 8]
    got = eng.encode(input_ids=[ids], pooling="last")[0]["embedding"]
    with torch.no_grad():
        hid = base(torch.tensor([ids])).last_hidden_state[0, -1]
        want = s2(torch.relu(s0(hid))).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=2e-3)
