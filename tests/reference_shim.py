"""Shim to run the reference driver under Python 3.12 without modifying
/root/reference: provide the removed `imp` module and a minimal `numexpr`
stand-in, then exec multi_bodies.py with argv."""
import os, sys, types, runpy, importlib, importlib.util, importlib.machinery

# fake `imp` (removed in 3.12): the reference only uses imp.load_source
imp = types.ModuleType("imp")
def load_source(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
imp.load_source = load_source
def find_module(name, path=None):
    if name in sys.modules:
        return None, name, ("", "", 0)
    spec = importlib.util.find_spec(name)
    if spec is None:
        raise ImportError(name)
    return None, spec.origin, ("", "", 0)
imp.find_module = find_module
sys.modules["imp"] = imp

# numexpr evaluates time-dependent constraint strings
# (constraint/constraint.py:108-119). Like the real numexpr, names must
# resolve from the CALLER's frame (e.g. `t = time` right before
# ne.evaluate('cos(-100*t)')), so pull the caller's locals/globals.
ne = types.ModuleType("numexpr")
def evaluate(expr, local_dict=None, **kw):
    import numpy as np
    env = {k: getattr(np, k) for k in ("sin","cos","tan","exp","sqrt","abs","arctan2","where","pi")}
    frame = sys._getframe(1)
    env.update(frame.f_globals)
    env.update(frame.f_locals)
    env.update(local_dict or {})
    return np.asarray(eval(expr, {"__builtins__": {}}, env))
ne.evaluate = evaluate
sys.modules["numexpr"] = ne

# numba is not installed: stub njit/prange so the reference's numba
# kernels run as plain python loops (slow but exact; tiny N only)
numba = types.ModuleType("numba")
def njit(*args, **kw):
    if args and callable(args[0]):
        return args[0]
    def deco(f):
        return f
    return deco
numba.njit = njit
numba.jit = njit
numba.prange = range
numba.__spec__ = importlib.machinery.ModuleSpec("numba", None)
sys.modules["numba"] = numba

# the reference's revcom-Fortran gmres wrapper needs scipy internals
# removed in modern scipy; the drivers' main path uses utils.gmres, so a
# scipy-backed stand-in with the same signatures suffices
qi_gmres = types.ModuleType("quaternion_integrator.gmres")
def _scipy_gmres(A, b, x0=None, tol=1e-8, M=None, maxiter=1000,
                 restrt=None, restart=None, callback=None, residuals=None,
                 verbose=False, convergence=None, **_ignored):
    import scipy.sparse.linalg as spla
    res = spla.gmres(A, b, x0=x0, rtol=tol, atol=0.0, M=M,
                     maxiter=maxiter, restart=restrt or restart or 60,
                     callback=callback, callback_type="pr_norm")
    # reference quaternion_integrator/gmres.py returns (x, info, resnorms)
    return res[0], res[1], []
qi_gmres.gmres = _scipy_gmres
qi_gmres.right_gmres = _scipy_gmres
qi_gmres.presid_gmres = _scipy_gmres
qi_gmres.direct_gmres = _scipy_gmres
sys.modules["quaternion_integrator.gmres"] = qi_gmres

# visit writer boost extension is not compiled; only velocity-field
# plotting touches it
vwi = types.ModuleType("visit.visit_writer_interface")
def _no_visit(*a, **k):
    raise RuntimeError("visit writer extension not available")
vwi.boost_write_rectilinear_mesh = _no_visit
vwi.visit_writer_interface = _no_visit
sys.modules["visit.visit_writer_interface"] = vwi

# scipy >= 1.12 renamed gmres(tol=) to rtol=; the reference passes tol=
import scipy.sparse.linalg as _spla
_orig_gmres = _spla.gmres
def _compat_gmres(A, b, x0=None, tol=None, atol=0.0, **kw):
    if tol is not None:
        kw["rtol"] = tol
    return _orig_gmres(A, b, x0=x0, atol=atol, **kw)
_spla.gmres = _compat_gmres

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/multi_bodies")
# running `python multi_bodies.py` from an example directory puts that
# directory on sys.path — user_defined_functions.py import
# (multi_bodies_functions.py:474) relies on it
sys.path.insert(0, os.getcwd())

# reference ordering bug: for *_rollers schemes multi_bodies.py:1330
# reads multi_bodies_functions.calc_blob_blob_forces BEFORE assigning it
# at :1387 (the rollers examples sidestep this with local driver
# copies / user_defined_functions). Pre-assign the python backend.
import multi_bodies_functions as _mbf  # noqa: E402
if not hasattr(_mbf, "calc_blob_blob_forces"):
    _mbf.calc_blob_blob_forces = _mbf.set_blob_blob_forces("python")

script = sys.argv[1]
sys.argv = [script] + sys.argv[2:]
runpy.run_path(script, run_name="__main__")
