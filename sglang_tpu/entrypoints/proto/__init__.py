"""Vendored sglang runtime proto (wire-compatible with the reference's
`proto/sglang/runtime/v1/sglang.proto` — the service any existing sglang
gRPC client speaks).

The image ships `protoc` but not the grpcio-tools python codegen plugin,
so instead of generated `_pb2.py` stubs the messages are materialized at
import time from a checked-in binary FileDescriptorSet (`sglang.desc`,
regenerated from `sglang.proto` with plain protoc when present). This is
version-skew-proof: the runtime protobuf builds message classes from the
descriptors directly.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(__file__)
PROTO_PATH = os.path.join(_DIR, "sglang.proto")
DESC_PATH = os.path.join(_DIR, "sglang.desc")

SERVICE_NAME = "sglang.runtime.v1.SglangService"


def _ensure_desc() -> str:
    if not os.path.exists(DESC_PATH) or (
        os.path.exists(PROTO_PATH)
        and os.path.getmtime(PROTO_PATH) > os.path.getmtime(DESC_PATH)
    ):
        subprocess.run(
            [
                "protoc",
                f"--descriptor_set_out={DESC_PATH}",
                "--include_imports",
                f"-I{_DIR}",
                PROTO_PATH,
            ],
            check=True,
        )
    return DESC_PATH


class ProtoModule:
    """Message classes + service descriptor loaded from the descriptor set."""

    def __init__(self):
        from google.protobuf import (
            descriptor_pb2,
            descriptor_pool,
            message_factory,
        )

        fds = descriptor_pb2.FileDescriptorSet()
        with open(_ensure_desc(), "rb") as f:
            fds.ParseFromString(f.read())
        self.pool = descriptor_pool.DescriptorPool()
        for fd in fds.file:
            self.pool.Add(fd)
        self.service = self.pool.FindServiceByName(SERVICE_NAME)
        self._classes = {}
        self._factory = message_factory
        for fd in fds.file:
            fdesc = self.pool.FindFileByName(fd.name)
            for name, md in fdesc.message_types_by_name.items():
                self._classes[name] = message_factory.GetMessageClass(md)

    def __getattr__(self, name):
        try:
            return self._classes[name]
        except KeyError:
            raise AttributeError(name) from None

    def method_types(self, method_name: str):
        """(request_class, response_class, server_streaming) for an RPC."""
        m = self.service.FindMethodByName(method_name)
        req = self._factory.GetMessageClass(m.input_type)
        resp = self._factory.GetMessageClass(m.output_type)
        return req, resp, m.server_streaming


_pb = None


def get_pb() -> ProtoModule:
    global _pb
    if _pb is None:
        _pb = ProtoModule()
    return _pb
