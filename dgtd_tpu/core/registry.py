"""Name -> class registry.

TPU-native replacement for the reference's NEST ``@export`` decorator
(e.g. /root/reference/twig/model/cod.py:35, twig/dataset/cod10k_camo_train.py:11,
twig/metric/Smeasure.py:8): every public component (model, dataset, metric,
hook, optim constructor) registers under its class name so YAML recipes can
reference it via ``type:`` strings, keeping drop-in config parity with the
reference's cod.yml/sod.yml.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._store: Dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: Optional[str] = None):
        if obj is None:  # used as @registry.register(name="Foo")
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._store and self._store[key] is not obj:
            raise KeyError(f"{self.name}: duplicate registration for {key!r}")
        self._store[key] = obj
        return obj

    def get(self, key: str) -> Any:
        if key not in self._store:
            raise KeyError(
                f"{self.name}: unknown type {key!r}. Registered: {sorted(self._store)}"
            )
        return self._store[key]

    def build(self, cfg: dict, **extra) -> Any:
        """Instantiate from a ``{'type': Name, **kwargs}`` config dict."""
        cfg = dict(cfg)
        if "type" not in cfg:
            # a bare KeyError('type') from deep inside runner construction
            # is unlocatable; name the registry and show the offending block
            raise KeyError(
                f"{self.name}: config block has no 'type' key: {cfg!r}"
            )
        cls = self.get(cfg.pop("type"))
        return cls(**cfg, **extra)

    def __contains__(self, key: str) -> bool:
        return key in self._store

    def keys(self):
        return self._store.keys()


MODELS = Registry("models")
DATASETS = Registry("datasets")
METRICS = Registry("metrics")
HOOKS = Registry("hooks")
OPTIM_CONSTRUCTORS = Registry("optim_constructors")

#: single decorator mirroring NEST's ``@export``: dispatch to the right
#: registry is done by the caller choosing which registry to use; ``export``
#: records into a flat namespace for lookup-by-name from configs.
EXPORTS = Registry("exports")


def export(obj: Callable) -> Callable:
    """Register ``obj`` into the flat export namespace (NEST parity)."""
    EXPORTS.register(obj)
    return obj
