"""KV cache event publishing (reference kv_events / --enable-kv-cache-events):
an external subscriber can mirror prefix-cache contents from the event
stream alone."""

import uuid

import numpy as np

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.mem_cache.kv_events import (
    KVEventMirror,
    KVEventPublisher,
    page_chain_hash,
)
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def test_chain_hash_identity():
    a = page_chain_hash(None, [1, 2, 3])
    assert a == page_chain_hash(None, [1, 2, 3])
    assert a != page_chain_hash(None, [1, 2, 4])
    assert page_chain_hash(a, [5]) != page_chain_hash(None, [5])


def test_publisher_and_mirror_roundtrip():
    pub = KVEventPublisher()
    mirror = KVEventMirror(pub)
    ids = list(range(8))
    pub.block_stored(ids, [4, 9], page_size=4)
    assert mirror.match_prefix_pages(ids, 4) == 2
    assert mirror.match_prefix_pages(ids[:4] + [99, 99, 99, 99], 4) == 1
    pub.block_removed([9])
    assert mirror.match_prefix_pages(ids, 4) == 1
    pub.all_cleared()
    assert mirror.match_prefix_pages(ids, 4) == 0


def _drive(sched, prompt, n=6):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid, input_ids=list(prompt),
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True
            ),
        )
    )
    steps = 0
    while sched.has_work():
        sched.step()
        steps += 1
        assert steps < 300
    return rid


def test_scheduler_emits_events():
    sa = tiny_server_args(enable_kv_cache_events=True)
    sched = Scheduler(sa, tiny_runner(sa))
    mirror = KVEventMirror(sched.kv_events)
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 250, size=36).tolist()  # 2+ pages (page=16)

    _drive(sched, prompt)
    # the finished request's prefix was announced; mirror can match it
    assert mirror.match_prefix_pages(prompt, sched.page_size) >= 2
    assert sched.kv_events.events_published >= 1

    assert sched.flush_cache()
    assert mirror.match_prefix_pages(prompt, sched.page_size) == 0


def test_eviction_emits_block_removed():
    sa = tiny_server_args(enable_kv_cache_events=True)
    sched = Scheduler(sa, tiny_runner(sa))
    removed = []
    sched.kv_events.subscribe(
        lambda e: removed.extend(e.get("pages", []))
        if e["event"] == "block_removed"
        else None
    )
    rng = np.random.default_rng(3)
    _drive(sched, rng.integers(3, 250, size=40).tolist())
    # force LRU eviction of the cached prefix
    sched.radix_cache.evict(1 << 30)
    assert removed  # eviction was announced with page ids
    assert sched.check_memory() == 0


def test_mirror_reconciles_on_sequence_gap():
    """Lost events (ZMQ PUB drops/reconnect) leave the mirror stale in an
    unknown way: a sequence gap must clear it, and it must reconverge
    from subsequent stored events (reference gateway tree resync)."""
    from sglang_tpu.mem_cache.kv_events import KVEventMirror, KVEventPublisher

    pub = KVEventPublisher()
    mirror = KVEventMirror(pub)
    pub.block_stored([1, 2, 3, 4], [7], page_size=4)
    assert mirror.match_prefix_pages([1, 2, 3, 4], 4) == 1
    # simulate a dropped event: bump the publisher's counter silently
    pub.events_published += 3
    pub.block_stored([9, 9, 9, 9], [8], page_size=4)
    assert mirror.resyncs == 1
    # pre-gap state is gone; post-gap events apply
    assert mirror.match_prefix_pages([1, 2, 3, 4], 4) == 0
    assert mirror.match_prefix_pages([9, 9, 9, 9], 4) == 1
    # contiguous events after the resync do not trigger further clears
    pub.block_stored([5, 5, 5, 5], [9], page_size=4)
    assert mirror.resyncs == 1
    assert mirror.match_prefix_pages([5, 5, 5, 5], 4) == 1
