"""Kubernetes service discovery for the router.

Parity with reference `sgl-model-gateway/src/service_discovery.rs`:
watch pods matching a label selector and keep the router's worker set in
sync (pod becomes Ready -> add `http://<podIP>:<port>`; pod deleted or
NotReady -> remove). PD mode maps prefill/decode pods via their own
selectors, with the `sglang.ai/bootstrap-port` annotation carried for
prefill workers (reference ServiceDiscoveryConfig defaults).

TPU-image constraints: no kubernetes client dependency — the in-cluster
REST API is polled directly over aiohttp (bearer token + CA from the
serviceaccount mount, or an explicit `api_base` for tests/off-cluster
use). Polling a LIST every `interval` seconds replaces the watch stream:
worker churn is seconds-scale, the list is cheap, and it self-heals from
missed events by construction.
"""

from __future__ import annotations

import asyncio
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

SA_DIR = "/var/run/secrets/kubernetes.io/serviceaccount"
BOOTSTRAP_PORT_ANNOTATION = "sglang.ai/bootstrap-port"


@dataclass
class ServiceDiscoveryConfig:
    selector: str = ""  # label selector, e.g. "app=sglang,component=worker"
    namespace: Optional[str] = None  # None = all namespaces
    port: int = 8000
    interval: float = 10.0
    api_base: Optional[str] = None  # default: in-cluster endpoint
    token: Optional[str] = None  # default: serviceaccount token file
    # PD mode: separate selectors route pods into prefill/decode sets
    prefill_selector: str = ""
    decode_selector: str = ""
    bootstrap_port_annotation: str = BOOTSTRAP_PORT_ANNOTATION


@dataclass
class DiscoveredPod:
    name: str
    ip: str
    port: int
    pod_type: Optional[str] = None  # None | "prefill" | "decode"
    bootstrap_port: Optional[int] = None
    labels: Dict[str, str] = field(default_factory=dict)

    @property
    def url(self) -> str:
        return f"http://{self.ip}:{self.port}"


def _in_cluster_base() -> str:
    host = os.environ.get("KUBERNETES_SERVICE_HOST", "kubernetes.default.svc")
    port = os.environ.get("KUBERNETES_SERVICE_PORT", "443")
    return f"https://{host}:{port}"


def _read_sa_token() -> Optional[str]:
    try:
        with open(os.path.join(SA_DIR, "token")) as f:
            return f.read().strip()
    except OSError:
        return None


def pod_is_ready(pod: dict) -> bool:
    status = pod.get("status", {})
    if status.get("phase") != "Running" or not status.get("podIP"):
        return False
    for cond in status.get("conditions", []):
        if cond.get("type") == "Ready":
            return cond.get("status") == "True"
    return False


def parse_pod(pod: dict, config: ServiceDiscoveryConfig,
              pod_type: Optional[str] = None) -> Optional[DiscoveredPod]:
    if not pod_is_ready(pod):
        return None
    meta = pod.get("metadata", {})
    annotations = meta.get("annotations") or {}
    bootstrap = None
    if pod_type == "prefill":
        raw = annotations.get(config.bootstrap_port_annotation)
        if raw is not None:
            try:
                bootstrap = int(raw)
            except ValueError:
                bootstrap = None
    return DiscoveredPod(
        name=meta.get("name", ""),
        ip=pod["status"]["podIP"],
        port=config.port,
        pod_type=pod_type,
        bootstrap_port=bootstrap,
        labels=meta.get("labels") or {},
    )


class ServiceDiscovery:
    """Polls the k8s API and syncs the router's worker set. `router`
    needs `add_worker(url) / remove_worker(url)` and a `workers` list
    (the in-tree Router satisfies this)."""

    def __init__(self, router, config: ServiceDiscoveryConfig):
        self.router = router
        self.config = config
        self.api_base = config.api_base or _in_cluster_base()
        self.token = config.token or _read_sa_token()
        self.known: Set[str] = set()  # urls this discovery added
        self.pods: Dict[str, DiscoveredPod] = {}  # url -> pod
        self._task: Optional[asyncio.Task] = None
        self._stop = asyncio.Event()

    # ------------------------------------------------------------- k8s IO

    def _pods_path(self) -> str:
        ns = self.config.namespace
        return (
            f"/api/v1/namespaces/{ns}/pods" if ns else "/api/v1/pods"
        )

    async def _list_pods(self, session, selector: str) -> List[dict]:
        headers = {}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        params = {"labelSelector": selector} if selector else {}
        url = self.api_base + self._pods_path()
        async with session.get(
            url, params=params, headers=headers, ssl=False
        ) as resp:
            if resp.status != 200:
                raise RuntimeError(
                    f"k8s pod list {resp.status}: {await resp.text()}"
                )
            body = await resp.json()
        return body.get("items", [])

    async def _discover(self, session) -> Dict[str, DiscoveredPod]:
        found: Dict[str, DiscoveredPod] = {}
        c = self.config
        if c.prefill_selector or c.decode_selector:  # PD mode
            for selector, ptype in (
                (c.prefill_selector, "prefill"),
                (c.decode_selector, "decode"),
            ):
                if not selector:
                    continue
                for pod in await self._list_pods(session, selector):
                    d = parse_pod(pod, c, pod_type=ptype)
                    if d:
                        found[d.url] = d
        else:
            for pod in await self._list_pods(session, c.selector):
                d = parse_pod(pod, c)
                if d:
                    found[d.url] = d
        return found

    # --------------------------------------------------------------- sync

    def _sync(self, found: Dict[str, DiscoveredPod]) -> None:
        current = set(found)
        for url in current - self.known:
            if self.router.add_worker(url):
                logger.info(
                    "service discovery: + %s (pod %s)", url, found[url].name
                )
        for url in self.known - current:
            if self.router.remove_worker(url):
                logger.info("service discovery: - %s", url)
        self.known = current
        self.pods = found

    async def poll_once(self, session) -> None:
        self._sync(await self._discover(session))

    async def run(self) -> None:
        import aiohttp

        async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=30)
        ) as session:
            while not self._stop.is_set():
                try:
                    await self.poll_once(session)
                except Exception as e:
                    logger.warning("service discovery poll failed: %s", e)
                try:
                    await asyncio.wait_for(
                        self._stop.wait(), self.config.interval
                    )
                except asyncio.TimeoutError:
                    pass

    def start(self) -> None:
        self._task = asyncio.get_event_loop().create_task(self.run())

    async def stop(self) -> None:
        self._stop.set()
        if self._task is not None:
            await self._task
            self._task = None
