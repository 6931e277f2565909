"""Filter configuration: the C1/C3/C4 surface of the reference.

The reference pushes a JSON config into the user script via a required
``set_filter_config(config) -> True`` call (``python35_filter.cpp:564-620``),
supports hot reconfiguration under a mutex (``python35_filter.cpp:310-436``)
and an ``enable`` toggle defaulting to *false* — a disabled filter is a
pass-through (``plugin.cpp:56-64``, ``:234-242``).

Spark mapping: config is an immutable snapshot captured at plan-build time
(closure/broadcast); "reconfigure" = rebuild the plan (for streaming:
restart the query from its checkpoint, which replaces the reference's mutex
dance with exactly-once resumption).  ``enable`` gates at plan build — a
disabled operator contributes nothing to the plan, mirroring the
short-circuit in ``plugin.cpp:234-242`` at zero runtime cost.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class FilterConfig:
    """Immutable config snapshot for one filter stage."""

    name: str = "filter"
    enable: bool = False  # reference default: disabled (plugin.cpp:60-64)
    params: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, raw: str, name: str = "filter") -> "FilterConfig":
        """Parse the reference's JSON config shape.

        The reference hands scripts ``{"config": <json-string>}``
        (``python35_filter.cpp:596-607``); scripts then read keys like
        ``scale``/``offset`` (``examples/scale35.py:67-77``).
        """
        obj = json.loads(raw) if raw else {}
        if not isinstance(obj, dict):
            raise ValueError(
                f"filter config must be a JSON object, got: {raw!r}"
            )
        enable = _truthy(obj.pop("enable", False))
        return cls(name=name, enable=enable, params=obj)

    def get(self, key: str, default: Any = None) -> Any:
        return self.params.get(key, default)

    def with_params(self, **updates: Any) -> "FilterConfig":
        """Hot-reconfigure: return a new snapshot (C3)."""
        params = dict(self.params)
        enable = self.enable
        if "enable" in updates:
            enable = _truthy(updates.pop("enable"))
        params.update(updates)
        return FilterConfig(name=self.name, enable=enable, params=params)


def _truthy(v: Any) -> bool:
    # the reference compares the config string against "true"/"false"
    # (plugin.cpp:60-64 uses ConfigCategory boolean semantics)
    if isinstance(v, str):
        return v.strip().lower() in ("true", "1", "yes")
    return bool(v)
