"""Test utilities (the vcm.testing role: checksum_dataarray used by
the reference's regression gates, external/vcm/vcm/testing.py;
consumed at workflows/prognostic_c48_run/tests/test_regression.py:657).
"""

from __future__ import annotations

import hashlib

import numpy as np


def checksum_array(arr) -> str:
    """Deterministic md5 of array bytes (vcm.testing.checksum_dataarray
    semantics: value-sensitive, layout-normalized)."""
    a = np.ascontiguousarray(np.asarray(arr))
    h = hashlib.md5()
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(a.tobytes())
    return h.hexdigest()


def checksum_state(state) -> str:
    """Checksum of a whole Quantity-dict state, order-insensitive."""
    h = hashlib.md5()
    for name in sorted(state):
        q = state[name]
        values = getattr(q, "values", q)
        h.update(name.encode())
        h.update(checksum_array(values).encode())
    return h.hexdigest()


def regression_data(state) -> str:
    """One line per variable, like the reference's regtest outputs."""
    lines = []
    for name in sorted(state):
        q = state[name]
        values = getattr(q, "values", q)
        lines.append(f"{name}: {checksum_array(values)}")
    return "\n".join(lines) + "\n"
