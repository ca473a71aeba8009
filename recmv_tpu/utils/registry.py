"""mmcv-style component registry — parity with
``engineer/registry/registry.py`` (defined there, unused on the main
path; kept for config-driven component construction)."""

from __future__ import annotations

import inspect


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._module_dict = {}

    @property
    def name(self):
        return self._name

    @property
    def module_dict(self):
        return dict(self._module_dict)

    def get(self, key):
        return self._module_dict.get(key)

    def register_module(self, cls=None, *, name=None, force=False):
        def _register(c):
            key = name or c.__name__
            if not force and key in self._module_dict:
                raise KeyError(f"{key} already registered in {self._name}")
            self._module_dict[key] = c
            return c

        if cls is None:
            return _register
        return _register(cls)

    def __repr__(self):
        return f"Registry(name={self._name}, items={list(self._module_dict)})"


def build_from_cfg(cfg: dict, registry: Registry, default_args: dict | None = None):
    """Instantiate registry[cfg['type']](**cfg minus type, **default_args)."""
    assert isinstance(cfg, dict) and "type" in cfg
    args = dict(cfg)
    obj_type = args.pop("type")
    cls = registry.get(obj_type) if isinstance(obj_type, str) else obj_type
    if cls is None:
        raise KeyError(f"{obj_type} not in {registry.name} registry")
    if default_args:
        for k, v in default_args.items():
            args.setdefault(k, v)
    assert inspect.isclass(cls) or inspect.isfunction(cls)
    return cls(**args)


DATASETS = Registry("datasets")
NETWORKS = Registry("networks")
OPTIMIZERS = Registry("optimizers")
