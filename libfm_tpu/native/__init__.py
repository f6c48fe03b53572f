"""Native (C++) host components, loaded via ctypes.

The shared library is built on demand from native/fastio.cpp with the
system g++ (no pip deps). If the toolchain is unavailable the Python
fallbacks in libfm_tpu.data keep everything working.
"""

from libfm_tpu.native import fastdata  # noqa: F401
