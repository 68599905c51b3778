"""Shared helpers for the drivers."""
from __future__ import annotations


def resolve_engine(engine: str) -> str:
    """Map "auto" to the best available decode engine.

    "auto" prefers the native C++ engine (threaded, ~100x the scalar
    path) and falls back to "scalar" when it cannot be built; explicit
    names pass through. Fast paths always bail back to the scalar
    reference implementation when exact reference semantics demand it
    (salvage modes, corrupt streams), so "native" is always safe.
    """
    if engine != "auto":
        return engine
    from .. import native
    return "native" if native.available() else "scalar"
