from sglang_tpu.disaggregation.pd import PDOrchestrator, transfer_prefix_kv

__all__ = ["PDOrchestrator", "transfer_prefix_kv"]
