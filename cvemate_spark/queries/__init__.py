"""Assembled query registry: the declared query surface (SURVEY §2.12)."""

from __future__ import annotations

from .base import QuerySpec, Registry


def build_registry() -> Registry:
    from . import cvemate_ops, relational

    reg = Registry()
    reg.merge(relational.REG)
    reg.merge(cvemate_ops.REG)
    for mod_name in (
        "text_ops",
        "similarity_ops",
        "dedup_ops",
        "streaming_ops",
        "multimodal_ops",
        "engine_ops",
        "source_ops",
        "pipeline_ops",
    ):
        try:
            mod = __import__(f"{__name__}.{mod_name}", fromlist=["REG"])
        except ImportError:
            continue
        reg.merge(mod.REG)
    return reg


REGISTRY = build_registry()

__all__ = ["QuerySpec", "Registry", "REGISTRY", "build_registry"]
