"""csp.impl.mem_cache parity (reference csp/impl/mem_cache.py): the
wiring memoization cache controls under their defining-module path."""

from ..core.surface import clear_global_context, new_global_context  # noqa: F401
from ..plans.runtime import memoize as _memoize_decorator

csp_memoized = _memoize_decorator


def memoize(value=True):
    """Reference mem_cache.py:37-41 contract: ``with memoize(False):``
    turns wiring memoization off inside the block (returns a
    MemoizeControl). The package-level ``csp.memoize`` decorator form
    is also accepted for back-compat: passing a callable decorates it."""
    if callable(value):
        return _memoize_decorator(value)
    return MemoizeControl(value)


def csp_memoized_graph_object(*args, **kwargs):
    """Reference mem_cache.py decorator form with force_memoize=."""
    kwargs.pop("force_memoize", None)
    if args and callable(args[0]):
        return memoize(args[0])
    return memoize


class MemoizeControl:
    """reference mem_cache.py:13-33: a thread-local with-block that
    turns wiring memoization on/off; ``memoize()``-wrapped builders
    check :meth:`is_memoize_on` per call."""

    INST = __import__("threading").local()

    def __init__(self, memoize: bool = True):
        self._memoize = memoize
        self._prev = None

    @classmethod
    def is_memoize_on(cls) -> bool:
        inst = getattr(cls.INST, "instance", None)
        return not inst or inst._memoize

    def __enter__(self):
        self._prev = getattr(self.INST, "instance", None)
        self.INST.instance = self
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self._prev:
            self.INST.instance = self._prev
        else:
            del self.INST.instance
        return False


from collections import namedtuple as _namedtuple

#: reference mem_cache.py:10 — the (func, normalized-args) cache key
GraphFunctionObjectKey = _namedtuple("GraphFunctionObjectKey", ["func", "args"])


class CspGraphObjectsMemCache:
    """reference mem_cache.py:43-112 contract: a thread-local object
    cache scoping graph-build memoization — with-block scoped, child
    contexts snapshot the parent (``new_context``), and
    ``get_object_stats`` reports per-function instantiation counts."""

    import threading as _threading

    _THREAD_LOCAL_INSTANCE = _threading.local()

    def __init__(self):
        self._instantiated_objects: dict = {}
        self._user_objects: dict = {}
        self._prev_instance = None

    def clear(self, clear_user_objects: bool = True):
        self._instantiated_objects.clear()
        if clear_user_objects:
            self._user_objects.clear()

    def __enter__(self):
        self._prev_instance = self.instance()
        self._THREAD_LOCAL_INSTANCE.instance = self
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self._THREAD_LOCAL_INSTANCE.instance = self._prev_instance
        return False

    @classmethod
    def new_context(cls) -> "CspGraphObjectsMemCache":
        child = cls()
        cur = cls.instance()
        if cur:
            child._instantiated_objects.update(cur._instantiated_objects)
            child._user_objects.update(cur._user_objects)
        return child

    def get_object_stats(self, sort_by: str | None = "count") -> dict:
        if sort_by not in (None, "name", "count"):
            raise RuntimeError(f"Unsupported sort_by value {sort_by}")
        res: dict = {}
        for key in self._instantiated_objects:
            # user objects (set_user_object) may use arbitrary keys —
            # the stats report covers graph-function instantiations
            if not isinstance(key, GraphFunctionObjectKey):
                continue
            name = key.func.__name__
            res[name] = res.get(name, 0) + 1
        if sort_by == "name":
            return dict(sorted(res.items()))
        if sort_by == "count":
            return dict(sorted(res.items(), key=lambda t: (-t[1], t[0])))
        return res

    def __getitem__(self, key):
        from .constants import UNSET

        return self._instantiated_objects.get(key, UNSET)

    def __setitem__(self, key, value):
        self._instantiated_objects[key] = value

    def get_user_object(self, key):
        from .constants import UNSET

        return self._user_objects.get(key, UNSET)

    def set_user_object(self, key, value):
        self[key] = value
        self._user_objects[key] = value

    @classmethod
    def instance(cls):
        return getattr(cls._THREAD_LOCAL_INSTANCE, "instance", None)


def normalize_arg(arg):
    """reference mem_cache.py:135-149: a hashable normal form for
    memoization keys over (possibly nested) containers."""
    t = type(arg)
    if t in (list, tuple):
        return (t,) + tuple(normalize_arg(v) for v in arg)
    if isinstance(arg, set):
        return (t,) + tuple(normalize_arg(v) for v in sorted(arg))
    if isinstance(arg, dict):
        return (t,) + tuple(
            (normalize_arg(k), normalize_arg(arg[k])) for k in sorted(arg)
        )
    return arg


def function_full_name(f) -> str:
    """reference mem_cache.py:152-161: module-qualified name for
    csp_memoized_graph_object's function_name."""
    module = getattr(f, "__module__", None)
    return f.__name__ if module is None else f"{module}.{f.__name__}"
