from libfm_tpu.ops import samplers, segment

__all__ = ["samplers", "segment"]
