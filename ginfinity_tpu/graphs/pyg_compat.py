"""Pickle-level torch_geometric compatibility without torch_geometric.

The reference's inter-tool contract for window corpora is
``windows_graphs.pt``: a dict of PyG ``Data`` objects written with
``torch.save`` (generate_windows.py:171) and read back with
``torch.load(..., weights_only=False)`` (generate_embeddings.py:250).
PyG is not installed in this image, so this module provides minimal
stand-in classes registered under the REAL torch_geometric module paths
in ``sys.modules``.  Pickle records only module path + qualified name
for classes, therefore:

- reading: ``torch.load`` of a reference archive resolves
  ``torch_geometric.data.data.Data`` etc. to the stubs here and
  reconstructs plain objects exposing ``.x`` / ``.edge_index`` /
  ``.edge_attr`` / ``.num_base_nodes``;
- writing: archives produced here unpickle in a real PyG environment as
  genuine ``Data`` objects (same state layout PyG's own
  ``__getstate__``/``__setstate__`` produce/consume: a ``_store``
  GlobalStorage holding ``_mapping`` and a ``_parent`` back-reference).

If a real torch_geometric IS importable, the stubs are never installed
and the real classes are used.
"""

from __future__ import annotations

import sys
import types


class BaseStorage:
    """Mirror of torch_geometric.data.storage.BaseStorage's pickle
    surface: state = {'_mapping': dict, '_parent': Data} (PyG's
    __getstate__ dereferences the parent weakref; its __setstate__
    rewraps it — the stub just keeps the strong reference)."""

    def __init__(self, mapping=None, parent=None):
        self.__dict__["_mapping"] = dict(mapping or {})
        if parent is not None:
            self.__dict__["_parent"] = parent

    def __getattr__(self, key):
        mapping = self.__dict__.get("_mapping", {})
        if key in mapping:
            return mapping[key]
        raise AttributeError(key)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:  # unexpected layout from a future PyG: keep it inspectable
            self.__dict__["_state"] = state


class GlobalStorage(BaseStorage):
    pass


class NodeStorage(BaseStorage):
    pass


class EdgeStorage(BaseStorage):
    pass


class Data:
    """Mirror of torch_geometric.data.data.Data's pickle surface."""

    def __init__(self, **mapping):
        store = GlobalStorage(
            {k: v for k, v in mapping.items() if v is not None}, parent=self
        )
        self.__dict__["_store"] = store
        # Real Data instances carry these class references in __dict__
        # (from the FeatureStore/GraphStore mixins); including them makes
        # the written state match what real PyG pickles contain.
        self.__dict__["_tensor_attr_cls"] = DataTensorAttr
        self.__dict__["_edge_attr_cls"] = DataEdgeAttr

    def __getattr__(self, key):
        store = self.__dict__.get("_store")
        if store is not None:
            try:
                return getattr(store, key)
            except AttributeError:
                pass
        raise AttributeError(key)

    def __setattr__(self, key, value):
        self.__dict__["_store"].__dict__["_mapping"][key] = value

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    @property
    def num_nodes(self):
        return int(self.x.shape[0])


class _OpaqueAttr:
    """Tolerant stand-in for PyG attr helper classes that may appear in
    pickles (TensorAttr/EdgeAttr variants)."""

    def __init__(self, *args, **kwargs):
        self._args = args
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self._state = state


class DataTensorAttr(_OpaqueAttr):
    pass


class DataEdgeAttr(_OpaqueAttr):
    pass


class TensorAttr(_OpaqueAttr):
    pass


class EdgeAttr(_OpaqueAttr):
    pass


def _register(name: str, attrs: dict) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


_CLASS_PATHS = {
    "torch_geometric.data.data": {
        "Data": Data,
        "DataTensorAttr": DataTensorAttr,
        "DataEdgeAttr": DataEdgeAttr,
    },
    "torch_geometric.data.storage": {
        "BaseStorage": BaseStorage,
        "GlobalStorage": GlobalStorage,
        "NodeStorage": NodeStorage,
        "EdgeStorage": EdgeStorage,
    },
    "torch_geometric.data.feature_store": {"TensorAttr": TensorAttr},
    "torch_geometric.data.graph_store": {"EdgeAttr": EdgeAttr},
}


def ensure_pyg(force_stubs: bool = False):
    """Return a namespace with ``Data``: the real torch_geometric's if
    installed, otherwise install the pickle stubs and return those.

    A pre-existing in-memory fake (e.g. a test shim registered in
    sys.modules without ``__file__``) is augmented in place — only a
    real installation (a module loaded from disk) is left untouched."""
    existing = sys.modules.get("torch_geometric")
    is_real = existing is not None and getattr(existing, "__file__", None)
    if not force_stubs:
        if is_real:
            import torch_geometric.data as tgd

            return tgd
        if existing is None:
            try:
                import torch_geometric.data as tgd  # real install

                return tgd
            except ImportError:
                pass

    tg = _register("torch_geometric", {"_ginfinity_stub": True})
    tg_data = _register("torch_geometric.data", {})
    for path, cls_map in _CLASS_PATHS.items():
        mod = _register(path, cls_map)
        leaf = path.rsplit(".", 1)[1]
        setattr(tg_data, leaf, mod)
        for name, cls in cls_map.items():
            cls.__module__ = path
            cls.__qualname__ = name
    tg.data = tg_data
    tg_data.Data = Data
    return tg_data


# Point the stub classes at their real module paths up front so that
# pickling works even if ensure_pyg ran in another interpreter state.
for _path, _cls_map in _CLASS_PATHS.items():
    for _name, _cls in _cls_map.items():
        if _cls.__module__ == __name__:
            _cls.__module__ = _path
            _cls.__qualname__ = _name
