"""Worker-importability shim.

Ray pickles map_batches callables BY REFERENCE (module + qualname), so worker
processes must be able to import this package. When the driver initialises Ray
before the package's path reaches PYTHONPATH (the graft driver does exactly
this), workers would die with ModuleNotFoundError and the pipeline would hang
in retries. Registering the package's modules with cloudpickle's
by-value serializer ships the code inside every task payload instead —
no worker-side import needed, at a few-KB-per-task cost.

Call ``ensure_worker_importable()`` at every pipeline entry point, AFTER the
needed submodules are imported (it registers whatever is loaded).
"""

from __future__ import annotations

import sys

_registered: set = set()


def ensure_worker_importable(prefix: str = "jsonschema_validator_ray") -> None:
    try:
        from ray import cloudpickle
    except Exception:
        return
    for name, mod in list(sys.modules.items()):
        if mod is None or not name.startswith(prefix) or name in _registered:
            continue
        try:
            cloudpickle.register_pickle_by_value(mod)
            _registered.add(name)
        except Exception:
            pass
