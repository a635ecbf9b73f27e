"""Diagnostic-function registry
(workflows/diagnostics/fv3net/diagnostics/_shared/registry.py:12
equivalent; the reference parallelizes with joblib, here functions are
cheap numpy/JAX reductions computed in-process)."""

from __future__ import annotations

import logging
from typing import Callable, Dict

logger = logging.getLogger(__name__)


class Registry:
    def __init__(self, merge: Callable = None):
        self.funcs: Dict[str, Callable] = {}
        self.merge = merge or (lambda d: d)

    def register(self, name: str):
        def wrap(fn):
            if name in self.funcs:
                raise ValueError(f"duplicate diagnostic {name!r}")
            self.funcs[name] = fn
            return fn

        return wrap

    def compute(self, *args, **kwargs):
        out = {}
        for name, fn in self.funcs.items():
            try:
                result = fn(*args, **kwargs)
            except Exception:
                logger.exception("diagnostic %s failed", name)
                continue
            if isinstance(result, dict):
                for k, v in result.items():
                    out[f"{k}_{name}" if k else name] = v
            else:
                out[name] = result
        return self.merge(out)
