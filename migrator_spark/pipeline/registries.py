"""Named registries for extractors / transformers / loaders.

Mirrors the reference's ExtractorMap/TransformerMap string registries
(types.go:16-19, populated by init() in each extractor file) — config
files name a stage, the registry resolves the callable. Unlike the
reference (loaders hard-wired to DefaultLoader, main.go:99-100),
loaders are a registry too.
"""

from __future__ import annotations

from collections.abc import Callable

EXTRACTORS: dict[str, Callable] = {}
TRANSFORMERS: dict[str, Callable] = {}
LOADERS: dict[str, Callable] = {}


def register_extractor(name: str):
    def deco(fn):
        EXTRACTORS[name] = fn
        return fn

    return deco


def register_transformer(name: str):
    def deco(fn):
        TRANSFORMERS[name] = fn
        return fn

    return deco


def register_loader(name: str):
    def deco(fn):
        LOADERS[name] = fn
        return fn

    return deco


def resolve(kind: str, name: str) -> Callable:
    table = {"extractor": EXTRACTORS, "transformer": TRANSFORMERS, "loader": LOADERS}[kind]
    # ensure built-ins registered
    import migrator_spark.pipeline.extractors  # noqa: F401
    import migrator_spark.pipeline.loaders  # noqa: F401
    import migrator_spark.pipeline.transformers  # noqa: F401

    if name not in table:
        raise KeyError(f"unknown {kind} {name!r}; registered: {sorted(table)}")
    return table[name]
