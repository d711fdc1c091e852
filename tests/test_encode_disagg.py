"""Encode disaggregation (D5, reference `srt/disaggregation/encode_server.py`):
a standalone encode server owns the vision tower; the LLM engine fetches
multimodal embeddings over HTTP and must produce byte-identical output to
local encoding."""

import threading

import numpy as np
import pytest

torch = pytest.importorskip("torch")
aiohttp = pytest.importorskip("aiohttp")

from tests.test_llava import IMG_TOK, _tiny_llava  # reuse the tiny VLM


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("enc_disagg_llava")
    _tiny_llava().save_pretrained(path)
    return str(path)


def _engine(path, encode_url=None):
    from sglang_tpu import Engine

    return Engine(
        model_path=path, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning", encode_server_url=encode_url,
    )


def test_remote_encode_matches_local(ckpt):
    import asyncio

    from aiohttp import web

    from sglang_tpu.disaggregation.encode import build_encode_app

    # encode server over its own runner instance (own process in prod;
    # a thread keeps the test hermetic)
    enc_engine = _engine(ckpt)
    app = build_encode_app(enc_engine.runner)
    port = _free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()
    runner_box = {}

    def serve():
        asyncio.set_event_loop(loop)
        r = web.AppRunner(app)
        loop.run_until_complete(r.setup())
        site = web.TCPSite(r, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        runner_box["r"] = r
        started.set()
        loop.run_forever()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    assert started.wait(timeout=30)

    local = _engine(ckpt)
    remote = _engine(ckpt, encode_url=f"http://127.0.0.1:{port}")
    rng = np.random.default_rng(0)
    n_img_tokens = 4  # (28/14)^2 patches
    ids = (
        [int(x) for x in rng.integers(3, 250, size=3)]
        + [IMG_TOK] * n_img_tokens
        + [int(x) for x in rng.integers(3, 250, size=4)]
    )
    pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    out_local = local.generate(input_ids=ids, image_data=pix, sampling_params=sp)
    out_remote = remote.generate(input_ids=ids, image_data=pix, sampling_params=sp)
    assert out_remote["output_ids"] == out_local["output_ids"]
    loop.call_soon_threadsafe(loop.stop)
