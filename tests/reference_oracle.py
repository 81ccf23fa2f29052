"""Load the reference's pure-python mobility functions as a test oracle.

We import /root/reference/mobility/mobility.py directly (it degrades
gracefully when optional GPU/C++/FMM backends are absent) and use its
python dense builders for golden-parity tests. The reference is used at
test time only; no code is copied into the framework.
"""

import importlib.util
import os
import sys

_REF = "/root/reference"


def load_reference_body():
    """Import the reference Body and Quaternion classes (pure numpy)."""
    if not os.path.isdir(_REF):
        return None, None
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    from body.body import Body  # type: ignore
    from quaternion_integrator.quaternion import Quaternion  # type: ignore

    return Body, Quaternion


def load_reference_mobility():
    if not os.path.isdir(_REF):
        return None
    if "imp" not in sys.modules:
        # the reference targets old pythons; `imp` was removed in 3.12
        import types

        shim = types.ModuleType("imp")
        shim.load_source = lambda *a, **k: (_ for _ in ()).throw(ImportError)
        shim.find_module = lambda *a, **k: (_ for _ in ()).throw(ImportError)
        sys.modules["imp"] = shim
    path = os.path.join(_REF, "mobility", "mobility.py")
    spec = importlib.util.spec_from_file_location("_ref_mobility", path)
    mod = importlib.util.module_from_spec(spec)
    old_stdout = sys.stdout
    try:
        # the reference prints warnings about missing optional backends
        import io

        sys.stdout = io.StringIO()
        spec.loader.exec_module(mod)
    finally:
        sys.stdout = old_stdout
    return mod
