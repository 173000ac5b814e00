"""Native host runtime: C++ decode/staging pipeline with ctypes bindings.

``from popsift_tpu.runtime import native`` raises ImportError when the
C++ toolchain is unavailable; use :func:`available` to probe.
"""


def available() -> bool:
    try:
        from . import native  # noqa: F401
        return True
    except Exception:
        return False
