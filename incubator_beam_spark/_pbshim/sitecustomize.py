"""Worker-side half of incubator_beam_spark.pbshim.

Python's ``site`` module imports ``sitecustomize`` at interpreter startup
from the first directory on ``sys.path`` that has one; Spark Python
workers inherit PYTHONPATH from the JVM, so when ``pbshim.activate()``
prepends this directory before the session starts, every worker runs this
file. It makes the Cloud-SDK-vendored pure-Python protobuf runtime
importable as ``google.protobuf`` and disables the gencode>runtime
version-policy gate (vendored runtime 6.32 vs pyspark's 6.33 gencode —
wire-identical; see pbshim.py for the full rationale).

PHANTOM-PACKAGE TRAP: Spark workers have spark-core's JAR on sys.path
(zipimport), and that jar ships ``google/protobuf/*.proto`` resources —
enough for ``import google.protobuf`` to SUCCEED as an empty namespace
package (``__file__ is None``) with no Python modules inside. A bare
try/except-ImportError probe is therefore fooled; probe ``__file__``
instead, and purge the phantom from sys.modules before adding the vendor
path (a module already bound as a namespace package stays one even after
a regular package appears on sys.path).
"""

import os
import sys

_VENDOR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def _real_protobuf() -> bool:
    try:
        import google.protobuf as _gp
    except ImportError:
        return False
    return getattr(_gp, "__file__", None) is not None


if not _real_protobuf() and os.path.isdir(os.path.join(_VENDOR, "google", "protobuf")):
    for _k in [k for k in sys.modules if k == "google" or k.startswith("google.")]:
        del sys.modules[_k]
    sys.path.append(_VENDOR)
    try:
        from google.protobuf import runtime_version as _rv

        def _lenient(domain, major, minor, patch, suffix, location,
                     _orig=_rv.ValidateProtobufRuntimeVersion):
            # suppress ONLY runtime-older-than-gencode within the same
            # major line (wire-identical); everything else still raises
            try:
                _orig(domain, major, minor, patch, suffix, location)
            except Exception:
                if major == _rv.MAJOR and (minor, patch) > (_rv.MINOR, _rv.PATCH):
                    return
                raise

        _rv.ValidateProtobufRuntimeVersion = _lenient
    except ImportError:
        pass

# site imports only the FIRST sitecustomize on sys.path — since this
# directory is prepended to PYTHONPATH, chain-import the next one so an
# existing user sitecustomize is not shadowed (ADVICE r5).
_here = os.path.dirname(os.path.abspath(__file__))
for _p in sys.path:
    if os.path.abspath(_p or ".") == _here:
        continue
    _f = os.path.join(_p or ".", "sitecustomize.py")
    if os.path.isfile(_f):
        try:
            import importlib.util as _ilu

            _spec = _ilu.spec_from_file_location("sitecustomize", _f)
            _mod = _ilu.module_from_spec(_spec)
            # register BEFORE exec so a later explicit `import
            # sitecustomize` resolves to this module instead of
            # re-executing user startup code (ADVICE r6)
            sys.modules["sitecustomize"] = _mod
            _spec.loader.exec_module(_mod)
        except Exception as _e:
            # mirror site.py's own error reporting: never break startup,
            # but never swallow the user's failure silently (ADVICE r6)
            sys.modules.pop("sitecustomize", None)
            print(
                f"Error in chained sitecustomize ({_f}): {_e!r}",
                file=sys.stderr,
            )
        break
