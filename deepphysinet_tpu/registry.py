"""Name -> factory registries.

The reference wires every layer through small name->class dicts
(interface/build.py:11-20, model/builder.py:12-21, losses/builder.py:15-20,
utils/optims/builder.py:8-27).  Here a single generic ``Registry`` backs all of
them, so configs keep addressing components by the same string names.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    """A string -> factory mapping with decorator-style registration."""

    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable[..., Any]] = {}

    def register(self, name: Optional[str] = None, obj: Optional[Callable] = None):
        if obj is not None:  # direct call: REG.register('Name', fn)
            self._entries[name or obj.__name__] = obj
            return obj

        def deco(fn):
            self._entries[name or fn.__name__] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable[..., Any]:
        if name not in self._entries:
            raise KeyError(
                f"{self.name}: unknown entry {name!r}; available: {sorted(self._entries)}"
            )
        return self._entries[name]

    def build(self, name: str, **kwargs) -> Any:
        return self.get(name)(**kwargs)

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def keys(self):
        return self._entries.keys()


# Framework-wide registries.
MODELS = Registry("models")
LOSSES = Registry("losses")
OPTIMIZERS = Registry("optimizers")
LR_SCHEDULES = Registry("lr_schedules")
INTERFACES = Registry("interfaces")
DATASETS = Registry("datasets")
PROJECTIONS = Registry("projections")
