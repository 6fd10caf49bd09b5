"""google.protobuf shim for sandboxes without a pip-installed protobuf.

pyspark 4's ``transformWithStateInPandas`` state server speaks protobuf
between the JVM and the Python worker
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``, gencode 6.33.0).
This sandbox has no pip protobuf, but the Google Cloud SDK ships a
vendored **pure-Python protobuf 6.32.0 runtime** with unmodified
``google.protobuf`` package names at::

    /usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf

6.32 vs 6.33 trips only the gencode/runtime *version-policy* gate
(``runtime_version.ValidateProtobufRuntimeVersion`` raises when the
runtime minor is older than the gencode minor); the wire format and the
generated-code API are identical across the 6.x line, so ``activate()``
appends the vendored path (append, never prepend — a real install always
wins) and no-ops the validator.

Spark Python workers are separate interpreters spawned by the JVM, so the
in-process ``sys.path`` edit does not reach them. They get the shim via
``_pbshim/sitecustomize.py``: ``activate()`` prepends that directory to
``PYTHONPATH``, the JVM inherits the env when the first SparkSession
starts, forwards it to worker processes, and Python's ``site`` module
imports ``sitecustomize`` at worker startup. This is why
``session.get_spark`` calls ``activate()`` *before* ``getOrCreate`` —
after the JVM is up, its environment is frozen.

The vendored runtime is the pure-Python implementation
(``api_implementation.Type() == 'python'``); TWS exchanges small control
messages, so the C-extension speedup is irrelevant here.
"""

from __future__ import annotations

import os
import sys

VENDOR = "/usr/lib/google-cloud-sdk/platform/google_appengine"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")


def _vendor_present() -> bool:
    return os.path.isdir(os.path.join(VENDOR, "google", "protobuf"))


def _real_protobuf() -> bool:
    # Probe __file__, not importability: on Spark workers the spark-core
    # JAR's google/protobuf/*.proto resources make `import google.protobuf`
    # succeed as an EMPTY namespace package (__file__ is None). Same guard
    # as _pbshim/sitecustomize.py.
    try:
        import google.protobuf as gp
    except ImportError:
        return False
    return getattr(gp, "__file__", None) is not None


def activate() -> bool:
    """Make ``google.protobuf`` importable here and in future Spark
    Python workers. Returns True when protobuf is usable (real install or
    vendored), False when neither exists. Idempotent and cheap to call.
    """
    if not _real_protobuf():
        if not _vendor_present():
            return False
        # Purge any phantom namespace package: a module already bound as a
        # namespace stays one even after a regular package appears on path.
        for k in [k for k in sys.modules if k == "google" or k.startswith("google.")]:
            del sys.modules[k]
        if VENDOR not in sys.path:
            sys.path.append(VENDOR)
        parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
        if SHIM_DIR not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join([SHIM_DIR, *parts])
        try:
            from google.protobuf import runtime_version

            _patch_validator(runtime_version)
        except ImportError:
            pass
    return _real_protobuf()


def worker_protobuf_ok(spark) -> bool:
    """Will Python workers spawned by THIS session's JVM be able to
    import ``google.protobuf``?

    True when a REAL (non-vendored) install exists on the interpreter's
    site path (workers see the same site-packages), or when the shim's
    sitecustomize directory rode PYTHONPATH into the JVM's environment
    (i.e. ``activate()`` ran before the JVM started). False for a
    FOREIGN pre-started session whose JVM env was frozen without the
    shim — ``activate()`` can no longer help there, because the TWS
    state-server worker inherits the JVM env, not this process's
    (the round-5 driver failure mode)."""
    try:
        import google.protobuf as gp

        f = getattr(gp, "__file__", None)
        if f is not None and not f.startswith(VENDOR):
            # a real driver-side install proves the WORKER side only if
            # workers run this same interpreter — when the session pins
            # a different python (spark.pyspark.python / PYSPARK_PYTHON
            # in the JVM env), the driver probe says nothing (ADVICE r6)
            import sys

            try:
                worker_py = (
                    spark.conf.get("spark.pyspark.python", None)
                    or spark._jvm.java.lang.System.getenv("PYSPARK_PYTHON")
                )
            except Exception:
                worker_py = None
            if worker_py is None or os.path.realpath(
                worker_py
            ) == os.path.realpath(sys.executable):
                return True
    except ImportError:
        pass
    try:
        pp = spark._jvm.java.lang.System.getenv("PYTHONPATH") or ""
    except Exception:
        return False
    return SHIM_DIR in pp.split(os.pathsep)


def _patch_validator(rv) -> None:
    """Suppress ONLY the runtime-older-than-gencode case within the same
    major line (6.33 gencode on the vendored 6.32 runtime — wire- and
    API-identical). Every other policy violation (cross-major, bad
    domain) still raises, so other protobuf users in the process keep
    their compatibility gate (ADVICE r5)."""
    orig = rv.ValidateProtobufRuntimeVersion
    if getattr(orig, "_pbshim_lenient", False):
        return

    def lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except Exception:
            if major == rv.MAJOR and (minor, patch) > (rv.MINOR, rv.PATCH):
                return
            raise

    lenient._pbshim_lenient = True
    rv.ValidateProtobufRuntimeVersion = lenient
