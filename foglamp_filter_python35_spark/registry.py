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


# ---------------------------------------------------------------------------
# C2 — user-script loading with the reference's naming convention.
# The reference imports a module named after the script file and resolves
# a filter method whose name equals the script name, where a leading
# "<anything>_script_" prefix is stripped first (python35_filter.cpp:
# 447-476: "xxx_script_myfilter.py" -> method "myfilter"); the loaded
# callable takes/returns the list-of-dicts wire shape, and an optional
# module-level set_filter_config receives {"config": <json>} and must
# return True before data flows (python35_filter.cpp:564-615).
# ---------------------------------------------------------------------------


def script_method_name(script_path: str) -> str:
    """Method name derived from the script file name (reference rule).

    The method is everything after the LAST ``_script_`` marker — the
    reference uses rfind (python35_filter.cpp:460-464), so
    ``a_script_b_script_c.py`` resolves to ``c``.  With no marker the
    name is EMPTY: the reference force-disables the filter rather than
    guessing a method (python35_filter.cpp:487-493)."""
    import os  # noqa: PLC0415

    stem = os.path.basename(script_path)
    if stem.endswith(".py"):
        stem = stem[:-3]
    marker = "_script_"
    if marker not in stem:
        return ""
    return stem.rsplit(marker, 1)[1]


def load_filter_script(
    script_path: str,
    registry: TransformRegistry | None = None,
) -> str:
    """Import a user filter script and register it as a T9 stage.

    Returns the registered transform name (== the resolved method name).
    Missing file or a method that is absent/not callable aborts
    registration with a clear error — the analog of plugin_init
    returning NULL (plugin.cpp:213-214).

    A file name WITHOUT the ``_script_`` marker registers a disabled
    identity stage under the file stem and never imports the module —
    the reference force-disables the filter in this case (pass-through,
    python35_filter.cpp:487-493) to keep reconfiguration possible.
    """
    import importlib.util  # noqa: PLC0415
    import os  # noqa: PLC0415

    reg = registry or REGISTRY
    if not os.path.exists(script_path):
        raise FileNotFoundError(f"filter script not found: {script_path}")
    method = script_method_name(script_path)
    if not method:
        stem = os.path.basename(script_path).removesuffix(".py")
        reg.register(stem, lambda df, cfg: df)
        return stem
    spec = importlib.util.spec_from_file_location(
        f"_filter_script_{method}", script_path
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    fn = getattr(module, method, None)
    if not callable(fn):
        raise AttributeError(
            f"script {script_path!r} does not define a callable "
            f"{method!r} (reference naming rule: python35_filter.cpp:449-476)"
        )
    set_cfg = getattr(module, "set_filter_config", None)

    def stage_fn(df: DataFrame, cfg: FilterConfig) -> DataFrame:
        from foglamp_filter_python35_spark.operators.python_filter import (  # noqa: PLC0415
            run_python_filter,
        )

        return run_python_filter(
            df, fn, cfg, set_filter_config=set_cfg
        )

    reg.register(method, stage_fn)
    return method
