"""Global debug flag.

Mirrors the reference's ``torch_geometric.is_debug_enabled()`` global used
to gate shape/range validation inside ops (reference: gmm_conv.py:106-129).
On TPU, validation runs host-side on concrete inputs (never inside jit);
ops consult this flag before tracing.
"""

import contextlib

__debug_flag__ = {"enabled": False}


def is_debug_enabled() -> bool:
    """Return whether debug-mode input validation is enabled."""
    return __debug_flag__["enabled"]


def set_debug(enabled: bool) -> None:
    __debug_flag__["enabled"] = bool(enabled)


@contextlib.contextmanager
def debug():
    """Context manager enabling debug-mode validation within its scope."""
    prev = is_debug_enabled()
    set_debug(True)
    try:
        yield
    finally:
        set_debug(prev)
