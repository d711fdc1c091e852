"""Plugin loading.

Parity with reference plugin/entry-point support (`srt/utils.py` plugin
loading + model-registry extension points): external packages extend the
engine without forking it. A plugin is any importable module exposing
`register(api)`; it is named either in `--plugins module[,module...]` or
the `SGLANG_TPU_PLUGINS` environment variable.

The `api` handle exposes the stable extension points:
    api.register_model(cls)         models/registry.py registration
    api.register_tool_parser(name, detector_cls)
    api.server_args                 the live ServerArgs
"""

from __future__ import annotations

import importlib
import os
from dataclasses import dataclass, field
from typing import Any, List

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


@dataclass
class PluginApi:
    server_args: Any = None
    loaded: List[str] = field(default_factory=list)

    def register_model(self, cls) -> None:
        from sglang_tpu.models import registry

        registry._populate()
        registry.register_model(cls)

    def register_tool_parser(self, name: str, detector_cls) -> None:
        from sglang_tpu.parser import function_call

        function_call.DETECTORS[name] = detector_cls


def load_plugins(server_args=None) -> PluginApi:
    """Import every configured plugin module and call its register(api)."""
    specs: List[str] = []
    if server_args is not None and getattr(server_args, "plugins", None):
        specs += list(server_args.plugins)
    env = os.environ.get("SGLANG_TPU_PLUGINS", "")
    specs += [s for s in env.split(",") if s.strip()]
    api = PluginApi(server_args=server_args)
    for spec in specs:
        spec = spec.strip()
        if not spec or spec in api.loaded:
            continue
        mod = importlib.import_module(spec)
        if not hasattr(mod, "register"):
            raise ValueError(f"plugin {spec!r} has no register(api) function")
        mod.register(api)
        api.loaded.append(spec)
        logger.info("loaded plugin %s", spec)
    return api
