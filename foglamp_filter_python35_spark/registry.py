"""Transform registry + pipeline composition (C2 / S2 / C4).

The reference resolves one callable per filter stage by importing a module
named after the user's script and looking up a method with the script's
name (``python35_filter.cpp:447-626``); stages chain by each filter holding
a function pointer to the next (``plugin.cpp:108-121``).

Spark mapping: a registry of named transforms ``name -> fn(df, config) ->
df``; a pipeline is plain DataFrame composition via ``df.transform``.
A disabled stage contributes identity (C4, ``plugin.cpp:234-242``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from foglamp_filter_python35_spark.config import FilterConfig

TransformFn = Callable[[DataFrame, FilterConfig], DataFrame]


@dataclass(frozen=True)
class Stage:
    name: str
    fn: TransformFn
    config: FilterConfig


class TransformRegistry:
    """Engine-wide registry: ``{name: transform}`` (C2).

    ``register`` replaces on re-registration — the Spark analog of the
    reference's hot module reload (``PyImport_ReloadModule``,
    ``python35_filter.cpp:371-403``).
    """

    def __init__(self) -> None:
        self._transforms: dict[str, TransformFn] = {}

    def register(self, name: str, fn: TransformFn) -> None:
        self._transforms[name] = fn

    def get(self, name: str) -> TransformFn:
        if name not in self._transforms:
            raise KeyError(
                f"no transform {name!r}; registered: {sorted(self._transforms)}"
            )
        return self._transforms[name]

    def names(self) -> list[str]:
        return sorted(self._transforms)

    def stage(self, name: str, config: FilterConfig | None = None) -> Stage:
        cfg = config or FilterConfig(name=name, enable=True)
        return Stage(name=name, fn=self.get(name), config=cfg)


def apply_pipeline(df: DataFrame, stages: list[Stage]) -> DataFrame:
    """Chain filter stages exactly like the reference's OUTPUT_STREAM chain
    (``plugin.cpp:108-121``): each enabled stage feeds the next; a disabled
    stage is the identity pass-through (``plugin.cpp:234-242``)."""
    out = df
    for st in stages:
        if st.config.enable:
            out = st.fn(out, st.config)
    return out


#: Default engine registry, populated by the operator modules on import.
REGISTRY = TransformRegistry()
