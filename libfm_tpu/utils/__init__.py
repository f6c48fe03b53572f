from libfm_tpu.utils.rlog import RLog

__all__ = ["RLog"]
