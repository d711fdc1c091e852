from sglang_tpu.parallel.mesh import create_mesh, get_device_kind

__all__ = ["create_mesh", "get_device_kind"]
