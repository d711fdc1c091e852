from sglang_tpu.sampling.sampling_params import SamplingParams

__all__ = ["SamplingParams"]
