"""Prefill/decode disaggregation (reference `srt/disaggregation/`):
KV computed on the prefill engine moves to the decode engine and the
combined output is identical to a single engine doing everything."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def engines(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    from sglang_tpu import Engine

    path = tmp_path_factory.mktemp("pd_model")
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)

    def mk():
        return Engine(
            model_path=str(path), dtype="float32", device="cpu", page_size=16,
            context_length=256, max_total_tokens=2048,
            prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
            max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
            log_level="warning",
        )

    p, d, single = mk(), mk(), mk()
    yield p, d, single
    for e in (p, d, single):
        e.shutdown()


def test_pd_output_identical_to_single_engine(engines):
    from sglang_tpu.disaggregation import PDOrchestrator

    prefill, decode, single = engines
    pd = PDOrchestrator(prefill, decode)
    rng = np.random.default_rng(0)
    sp = {"max_new_tokens": 14, "temperature": 0.0, "ignore_eos": True}
    for m in (40, 19):
        prompt = rng.integers(3, 250, size=m).tolist()
        ref = single.generate(input_ids=prompt, sampling_params=sp)
        got = pd.generate(prompt, sp)
        assert got["output_ids"] == ref["output_ids"]
        assert got["meta_info"]["completion_tokens"] == 14
    # the 40-token prompt moved at least its aligned prefix (page=16)
    assert pd.tokens_transferred >= 32


def test_pd_decode_engine_hits_transferred_prefix(engines):
    """The decode engine's second leg must see the transferred KV as a
    radix cache hit (that's the point: no prompt recompute)."""
    from sglang_tpu.disaggregation import PDOrchestrator, transfer_prefix_kv

    prefill, decode, _ = engines
    rng = np.random.default_rng(7)
    prompt = rng.integers(3, 250, size=48).tolist()
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
    prefill.generate(input_ids=prompt, sampling_params=sp)
    moved = transfer_prefix_kv(prefill, decode, prompt)
    assert moved >= 48 // 16 * 16 - 16  # aligned prefix (last page may be partial)
    out = decode.generate(input_ids=prompt, sampling_params=sp)
    # admission always computes the last token, so the hit is capped at
    # the page below it even when more KV was transferred
    assert out["meta_info"]["cached_tokens"] >= (len(prompt) - 1) // 16 * 16
    # idempotent: a second transfer moves nothing new
    assert transfer_prefix_kv(prefill, decode, prompt) == 0
    assert decode.scheduler.check_memory() == 0


def test_pd_tcp_transport_identical_output(engines):
    """Cross-host transport: KV pages move over a real TCP socket
    (reference `mooncake/conn.py` role; the server is `conn.py
    KVTransferServer`). Two-process-equivalent: byte-identical output."""
    from sglang_tpu.disaggregation import PDOrchestrator
    from sglang_tpu.disaggregation.conn import KVTransferServer, TCPKVBackend

    prefill, decode, single = engines
    server = KVTransferServer(prefill, host="127.0.0.1")
    backend = TCPKVBackend(f"127.0.0.1:{server.port}")
    try:
        pd = PDOrchestrator(prefill, decode, backend=backend)
        rng = np.random.default_rng(123)
        sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
        prompt = rng.integers(3, 250, size=37).tolist()
        ref = single.generate(input_ids=prompt, sampling_params=sp)
        got = pd.generate(prompt, sp)
        assert got["output_ids"] == ref["output_ids"]
        assert pd.tokens_transferred >= 32  # aligned prefix moved over TCP
    finally:
        backend.close()
        server.close()


def test_pd_fake_backend_failure_degrades_to_recompute(engines):
    """Transfer failures must not corrupt output — the decode engine
    recomputes the prompt (reference fake/conn.py failure seam)."""
    from sglang_tpu.disaggregation import PDOrchestrator
    from sglang_tpu.disaggregation.conn import FakeKVBackend, LocalKVBackend

    prefill, decode, single = engines
    backend = FakeKVBackend(LocalKVBackend(prefill), fail_every=1)
    pd = PDOrchestrator(prefill, decode, backend=backend)
    rng = np.random.default_rng(9)
    sp = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}
    prompt = rng.integers(3, 250, size=33).tolist()
    ref = single.generate(input_ids=prompt, sampling_params=sp)
    got = pd.generate(prompt, sp)
    assert got["output_ids"] == ref["output_ids"]
    assert len(backend.calls) == 1  # the fetch was attempted and failed
    assert pd.tokens_transferred == 0
