"""``import csp`` → csp_spark, including SUBMODULES.

``sys.modules['csp'] = csp_spark`` aliases only the top level: a later
``from csp.adapters.parquet import ...`` walks the package __path__ and
RE-EXECUTES the submodule under the alias name, producing duplicate
class objects (isinstance across the two copies fails). The meta-path
finder installed by :func:`enable_reference_alias` redirects every
``csp[.x.y]`` import to the already-imported ``csp_spark[.x.y]`` module
object, so reference programs — whatever they import from the csp
namespace — share one set of classes with the host.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import sys

__all__ = ["enable_reference_alias"]


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, mod):
        self._mod = mod

    def create_module(self, spec):
        return self._mod

    def exec_module(self, module):  # already executed as csp_spark.*
        pass


class _CspAliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname != "csp" and not fullname.startswith("csp."):
            return None
        real = "csp_spark" + fullname[len("csp"):]
        try:
            mod = importlib.import_module(real)
        except ImportError:
            return None
        spec = importlib.machinery.ModuleSpec(
            fullname, _AliasLoader(mod), is_package=hasattr(mod, "__path__")
        )
        return spec


_installed = False


def enable_reference_alias() -> None:
    """Make ``import csp`` (and any ``csp.*`` submodule import) resolve
    to csp_spark. Idempotent."""
    global _installed
    if _installed:
        return
    sys.meta_path.insert(0, _CspAliasFinder())
    sys.modules.setdefault("csp", sys.modules["csp_spark"])
    # Pre-seed every already-imported csp_spark.* submodule under its
    # csp.* name: `import csp.curve` then resolves straight from
    # sys.modules, so the import machinery never re-setattrs the parent
    # package — which would clobber function attributes that share a
    # submodule's name (csp.curve the factory vs csp/curve.py), the
    # same name-shadowing order the reference fixes in csp/__init__.py.
    for name, mod in list(sys.modules.items()):
        if name.startswith("csp_spark.") and mod is not None:
            sys.modules.setdefault("csp" + name[len("csp_spark"):], mod)
    _installed = True
